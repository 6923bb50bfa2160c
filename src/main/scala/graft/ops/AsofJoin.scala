package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the point-in-time primitive Spark lacks natively:
  * for each left row, attach the LATEST right row with the same key and
  * `rightTs <= leftTs` (inclusive, like DuckDB's `ASOF JOIN ... ON l.ts >=
  * r.ts` and kdb's `aj`). In the crawl pipeline this is "join each page
  * fetch to the domain's robots/policy snapshot in force AT THAT warc_ts";
  * in attribution it is "credit each conversion to the user's most recent
  * touch".
  *
  * Spark-first shape — the union + running-window formulation: tag right
  * rows m=0 and left rows m=1, union them, and take the running
  * `last(payload, ignoreNulls)` over (PARTITION BY key ORDER BY ts, m,
  * ROWS UNBOUNDED PRECEDING..CURRENT). Right-before-left at equal ts gives
  * the inclusive bound. Compare the naive alternatives: an inequality join +
  * per-left max + self-join back is three shuffles and a potentially
  * quadratic intermediate (every left row × every earlier right row of its
  * key); a per-key `collect_list` caps the key's history at executor memory.
  * Here shuffle volume is |L| + |R| slim rows through the one window
  * exchange (plus one right-side-only pre-aggregation for the duplicate
  * collapse below), the per-key sort is the only extra cost, and skew
  * behaves like any window (a hot key sorts its own rows — no pair blowup),
  * so the plan survives 100 TB unchanged.
  *
  * Determinism: duplicate right rows on (key, ts) are pre-collapsed with
  * `max` per payload column — without this, "which right row wins" is
  * engine- and partitioning-dependent (DuckDB's ASOF picks an arbitrary
  * one). After the collapse both engines agree bit-for-bit at any
  * parallelism; AsofJoinSpec gates the tie bound, the collapse, and
  * partitioning invariance.
  */
object AsofJoin {

  /** Left rows + `<prefix><payloadCol>` columns from the matched right row
    * (null where no right row precedes), plus `<prefix>ts` = the matched
    * right timestamp. `right` must have columns `keys :+ tsCol :+ payloads`.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val payloads = right.columns.toSeq.filterNot(c => keys.contains(c) || c == tsCol)
    require(payloads.nonEmpty, "right side has no payload columns")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(c => c.startsWith(prefix)),
      s"left already has a '$prefix'-prefixed column")

    // collapse right duplicates on (key, ts) so the winner is well-defined
    val r = right.groupBy((keys :+ tsCol).map(col): _*)
      .agg(payloads.head -> "max", payloads.tail.map(_ -> "max"): _*)
      .toDF(keys ++ (tsCol +: payloads): _*)

    val rTagged = r.select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as("__m")) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(tsCol).as(s"${prefix}ts")) ++
        payloads.map(c => col(c).as(s"$prefix$c")): _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(1).as("__m")) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol).map(col) ++
        Seq(lit(null).cast(r.schema(tsCol).dataType).as(s"${prefix}ts")) ++
        payloads.map(c => lit(null).cast(r.schema(c).dataType).as(s"$prefix$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__m").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (s"${prefix}ts" +: payloads.map(p => s"$prefix$p"))
      .foldLeft(rTagged.unionByName(lTagged)) { (df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
    carried.filter(col("__m") === 1).drop("__m")
      .select((leftCols :+ s"${prefix}ts") ++ payloads.map(p => s"$prefix$p") map col: _*)
  }
}
