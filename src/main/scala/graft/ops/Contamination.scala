package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection for training corpora: flag training
  * documents that share word n-grams with a held-out benchmark/eval set
  * (the decontamination step every serious pretraining pipeline runs —
  * n-gram overlap, typically n=8..13, against the eval suites).
  *
  * Scale design: the benchmark side is small by definition (eval suites are
  * KB–MB against a 100 TB corpus), so its distinct n-gram set is built once
  * and BROADCAST; the corpus side explodes its n-grams map-side and the
  * overlap is a broadcast semi-join + one aggregation keyed by doc_id —
  * exactly one shuffle, no corpus×corpus pairing, and the corpus n-grams
  * are hashed to 8 bytes (xxhash64) before the join so the shuffled rows
  * carry no strings.
  */
object Contamination {

  /** xxhash64 of each DISTINCT word n-gram, via the native shingle kernel
    * (one tight loop per row vs an interpreted `transform` lambda — the
    * q36 kernel rationale; the kernel's hash is exactly Spark's xxhash64
    * over the gram string, so it joins cleanly against `xxhash64(gram)`
    * computed anywhere else). The kernel's short-doc convention (whole
    * text as one shingle when < n words) is masked to THIS operator's
    * convention: no grams. */
  def gramHashes(text: Column, n: Int): Column =
    when(size(TextStats.words(text)) < n, array().cast("array<bigint>"))
      .otherwise(Dedup.shingleHashes(text, n))

  /** Per-doc contamination report of `docs` against `benchmark`
    * (both need doc_id + text). Output: one row per corpus doc with the
    * number of distinct n-grams shared with the benchmark and the fraction
    * of its n-grams that are contaminated. Benchmark docs themselves are
    * excluded from the report (anti-join on doc_id) — this ASSUMES the two
    * tables share one doc_id space (the corpus-slice-as-benchmark case); if
    * the benchmark carries unrelated ids, a coincidental collision would
    * silently drop a corpus doc from the report, so callers with disjoint id
    * spaces should remap benchmark ids (e.g. negate them) before calling. */
  def report(docs: DataFrame, benchmark: DataFrame, n: Int = 8,
             textCol: String = "text"): DataFrame = {
    // distinct benchmark n-grams, hashed map-side by the kernel — the
    // broadcast side
    val benchGrams = benchmark
      .select(explode(gramHashes(col(textCol), n)).as("gh")).distinct()
    val corpus = docs.join(benchmark.select(col("doc_id")), Seq("doc_id"), "left_anti")
    // kernel output is already the DISTINCT gram-hash set per doc
    val grams = corpus.select(col("doc_id"),
        explode_outer(gramHashes(col(textCol), n)).as("gh"))
      .select(col("doc_id"), col("gh"), col("gh").isNotNull.as("present"))
    grams
      .join(broadcast(benchGrams.withColumn("hit", lit(1))), Seq("gh"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(sum(when(col("present") && col("hit").isNotNull, 1L).otherwise(0L)).as("n_shared"),
        sum(when(col("present"), 1L).otherwise(0L)).as("n_grams"))
      .select(col("doc_id"), col("n_shared"), col("n_grams"),
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(round(col("n_shared").cast("double") / col("n_grams").cast("double"), 4))
          .as("contaminated_ratio"),
        (col("n_shared") > 0).as("contaminated"))
  }

  /** Decontamination FILTER (the funnel-stage shape of [[report]]): survivors
    * of `docs` that share NO word n-gram with the benchmark. Benchmark docs
    * are NOT excluded by id here — `docs` and `benchmark` are independent
    * tables (a funnel corpus vs an external eval suite), so no shared-id
    * assumption. One broadcast of the (small) benchmark gram set, one
    * distinct on hit doc_ids, one anti-join. */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, n: Int = 8,
                    textCol: String = "text", benchTextCol: String = "text"): DataFrame = {
    val benchGrams = benchmark
      .select(explode(gramHashes(col(benchTextCol), n)).as("gh")).distinct()
    val hit = docs
      .select(col("doc_id"), explode(gramHashes(col(textCol), n)).as("gh"))
      .join(broadcast(benchGrams), Seq("gh"), "left_semi")
      .select(col("doc_id")).distinct()
    docs.join(hit, Seq("doc_id"), "left_anti")
  }
}
