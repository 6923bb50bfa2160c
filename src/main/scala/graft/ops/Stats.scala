package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-distribution statistics for pipeline monitoring: EXACT per-group
  * quantiles by rank selection over a value HISTOGRAM. The quantile value
  * is the element at 0-based rank floor((n-1)·q) of the sorted group —
  * element selection, not interpolation, so the result is an actual data
  * value, bit-exact and engine-independent (percentile_cont-style
  * interpolation hinges on each engine's float blend of the straddling
  * values).
  *
  * Scale design: a naive per-group sort (Window over raw rows) serializes
  * each group through one task — a per-language group at 10^12 docs is
  * billions of rows, so that shape breaks exactly when it matters.
  * Instead: `groupBy(group, value).count()` collapses the data to one row
  * per DISTINCT value per group (integral metrics like char/token counts
  * have thousands of distinct values, independent of corpus size), the
  * cumulative count runs over that small histogram, and the quantile is
  * the first value whose cumulative count reaches the target rank. Two
  * hash aggregations + one histogram-sized window; all arithmetic on exact
  * integers.
  */
object Stats {

  /** Exact quantiles of integral `valueCol` per `groupCol`. Output: one row
    * per group — n_docs, p50/p90/p99 (or the given `qs`), mean (rounded,
    * exact-integer sum). */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val hist = df.groupBy(col(groupCol), col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col(groupCol))))
    val qCols = qs.map { q =>
      // 1-based target rank floor((n-1)*q)+1; the quantile is the smallest
      // value whose cumulative count reaches it
      val target = floor((col("n") - 1).cast("double") * lit(q)).cast("long") + 1
      min(when(col("cum") >= target, col("v"))).as(f"p${(q * 100).round}%02d")
    }
    val meanCol = round(sum(col("v") * col("c")).cast("double") /
      sum(col("c")).cast("double"), 4).as("mean")
    cum.groupBy(col(groupCol))
      .agg(sum(col("c")).as("n_docs"), (qCols :+ meanCol): _*)
  }
}
