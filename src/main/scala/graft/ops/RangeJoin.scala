package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — the second join primitive Spark lacks a
  * scalable native plan for (a raw `ON p.t >= i.start AND p.t < i.end`
  * predicate plans as BroadcastNestedLoopJoin: per-key cartesian, the exact
  * trap the triangle counter's OR-join hit). In the crawl pipeline this is
  * "which fetches fall inside each domain's maintenance/recrawl window";
  * in analytics it is event-to-session/campaign-window assignment.
  *
  * Spark-first shape — bin-and-verify, all equi-joins: quantize the axis
  * into fixed `binWidth` buckets, explode each interval into the bins it
  * covers, map each point to its single bin, hash-join on (key, bin), then
  * verify the exact `start <= t < end` bound. Each (interval, bin) row is
  * unique and a point lives in exactly one bin, so a qualifying pair is
  * produced EXACTLY once — no distinct needed. Shuffle volume is
  * |P| + |I|·(span/binWidth + 1) slim rows; pick binWidth ≈ the typical
  * interval span so the interval blowup is a small constant. Skewed keys
  * behave like any equi-join (AQE splits hot partitions); there is no
  * quadratic candidate set to detonate, which is what kills the naive plan
  * at 100 TB.
  *
  * Axis values are exact integers (micros/longs) end to end — no float
  * boundaries — so results are bit-identical at any parallelism and the
  * DuckDB oracle is the plain inequality join.
  */
object RangeJoin {

  /** Pairs (point columns ++ interval columns) for every point with
    * `start <= t < end` on the same `keys`. Interval/point column-name
    * overlap (beyond `keys`) is the caller's to avoid. Intervals with
    * `end <= start` match nothing (empty half-open range). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], tCol: String,
                      startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(keys.nonEmpty, "range join needs at least one key column")
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val b = lit(binWidth)
    // bin id = the floor multiple itself (c - pmod(c, b)): pure Long
    // arithmetic, floor-correct on negative axes, no double-typed division
    def fm(c: org.apache.spark.sql.Column) = (c.cast("long") - pmod(c.cast("long"), b))
    val i = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bin",
        explode(sequence(fm(col(startCol)), fm(col(endCol) - 1), b)))
    val p = points.withColumn("__bin", fm(col(tCol)))
    p.join(i, keys :+ "__bin")
      .filter(col(tCol) >= col(startCol) && col(tCol) < col(endCol))
      .drop("__bin")
  }
}
