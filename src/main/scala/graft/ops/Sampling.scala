package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling for training-data mixtures: each
  * stratum (e.g. language, source, quality band) gets its own keep-rate,
  * and membership is decided by a content hash — not `rand()` — so the
  * sample is (a) reproducible bit-for-bit across runs, cluster sizes and
  * engines, (b) stable under re-partitioning, and (c) consistent: the same
  * document always lands on the same side, so incremental re-runs over a
  * growing corpus never flip earlier decisions.
  *
  * Scale design: the keep decision is a pure codegen'd column predicate
  * (md5 → first 4 hex chars → lexicographic compare against the stratum's
  * threshold), evaluated inside the scan — a 100 TB mixture materializes at
  * full scan rate with zero shuffles. The hex-string compare (rather than
  * hex→int conversion) is deliberate: it is reproducible verbatim in any
  * SQL engine, which is how the DuckDB oracle checks it.
  */
object Sampling {

  /** Uniform [0, 65536) bucket from the doc's content+id hash, as a 4-hex
    * string: `substr(md5(concat(doc_id, ':', text)), 1, 4)`. */
  def bucketHex(docId: Column, text: Column): Column =
    substring(md5(concat(docId.cast("string"), lit(":"), text).cast("binary")), 1, 4)

  /** 4-char lowercase hex threshold for keep-rate `rate` (fraction of the
    * 65536 bucket space, floor). keep ⇔ bucket < threshold. */
  def rateToHex(rate: Double): String = {
    val t = math.max(0, math.min(65536, math.floor(rate * 65536).toLong))
    // keep-all sentinel "g": 'g' > 'f' so every 4-hex bucket compares below
    // it ("10000" would NOT work — "abcd" < "10000" is false lexically)
    if (t >= 65536) "g" else f"$t%04x"
  }

  /** Stratified deterministic sample: `rates` maps stratum value → keep
    * rate; strata not listed get `defaultRate`. Keeps the row iff its hash
    * bucket falls under the stratum's threshold. */
  def stratifiedSample(docs: DataFrame, stratumCol: String,
                       rates: Map[String, Double], defaultRate: Double = 0.0,
                       textCol: String = "text"): DataFrame = {
    val bucket = bucketHex(col("doc_id"), col(textCol))
    val threshold = rates.foldLeft(lit(rateToHex(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, lit(rateToHex(rate))).otherwise(acc)
    }
    docs.withColumn("bucket", bucket)
      .filter(col("bucket") < threshold)
  }

  /** Per-domain quota cap — the domain-balancing step that stops one giant
    * crawl host from dominating a training mixture: keep at most `cap` docs
    * per domain, preferring the highest quality score (doc_id breaks ties
    * deterministically).
    *
    * Scale design: runs on the custom bounded-heap top-k operator
    * (graft.plans.TopK — partial per-partition heaps, then a merge capped at
    * `cap` rows per key), NOT a `row_number` window. A window partitioned by
    * domain sorts every row of the hottest domain in one task; the heap
    * operator holds `cap` rows per key per partition regardless of how
    * skewed the domain distribution is, which is the shape that survives a
    * single domain with billions of pages. */
  def domainQuota(docs: DataFrame, cap: Int, domainCol: String = "source"): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val scored = docs.select(col(domainCol).as("source"), col("doc_id"),
      round(TextStats.qualityScore(col("text")), 2).as("quality"))
    graft.plans.TopK.perKey(scored, Seq(col("source")),
        Seq(desc("quality"), asc("doc_id")), k = cap)
      .select(col("source"), col("rn").cast("long").as("rn"),
        col("doc_id"), col("quality"))
  }
}
