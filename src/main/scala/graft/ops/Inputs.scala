package graft.ops

import org.apache.spark.sql.DataFrame

/** Input-distribution guard for operators with heavy scan-side kernels
  * (shingle/minhash hashing, gram md5, quality regex chains): if the
  * incoming frame cannot feed the session's parallelism — the unsplittable
  * single-row-group case of guide §2.5 (a parquet row group cannot be
  * divided across tasks, so byte-range splits of one-row-group files leave
  * every row in one task) — redistribute ONCE before the kernel pass. On
  * adequately-split input (any real lake) this is a no-op; it is NOT a
  * blanket read-side repartition, which A/B-measured net-negative for the
  * cheap-first-exchange query shapes (see SparkEntry.t's note). */
object Inputs {

  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
