package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: pre-shuffle a fact table ONCE at write time so
  * every subsequent equi-join/aggregation on the bucket key runs with zero
  * exchanges — the standard way repeated 100 TB joins amortize their shuffle.
  *
  * Spark's bucketing rides the session catalog (`bucketBy` requires
  * `saveAsTable`); tables land in the warehouse dir as plain parquet plus
  * bucket metadata. Reading them back through the catalog gives scans whose
  * `outputPartitioning` already satisfies the join distribution, so Catalyst
  * plans `SortMergeJoin` with NO `Exchange` on the bucketed sides
  * (asserted in BucketedJoinSpec). */
object BucketedTables {

  /** Write `df` bucketed (and sorted) by `key` into `nBuckets` buckets as a
    * catalog table. Sorting within buckets makes the downstream
    * SortMergeJoin's per-bucket sort a no-op for this side. */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Co-located equi-join of two tables bucketed on the same key with the
    * same bucket count: no exchange on either side. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String): DataFrame = {
    // single read per side: the join condition must reference the SAME
    // resolved attributes as the join inputs (re-reading relies on the
    // catalog relation cache keeping exprIds stable, which REFRESH TABLE or
    // a concurrent write invalidates)
    val l = read(spark, leftTable)
    val r = read(spark, rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
