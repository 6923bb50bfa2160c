package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`): brute-force
  * cosine top-k as the exact baseline, random-hyperplane LSH bucketing as the
  * scale path, and near-duplicate pair mining.
  *
  * All vector math is `zip_with`/`aggregate` higher-order functions over the
  * array column — Tungsten-evaluated, no UDF, no mllib Vector conversion. */
object Similarity {

  /** dot(x, y) in double precision. */
  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(x: Column): Column = sqrt(dot(x, x))

  def cosine(x: Column, y: Column): Column = {
    val d = norm(x) * norm(y)
    when(d === 0, lit(0.0)).otherwise(dot(x, y) / d)
  }

  /** Exact top-k neighbors for each query vector (brute force — the
    * correctness baseline; linear in corpus size, broadcast the queries). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }

  /** Random-hyperplane LSH bucket id: `nBits`-bit sign signature. Hyperplane
    * components are deterministic ±1 weights derived from (bit, dim) — a
    * public standard trick (sign of sum of ±-weighted coords ≈ random
    * hyperplane for high dims). */
  def lshBucket(vec: Column, nBits: Int = 12): Column = {
    val bits = (0 until nBits).map { b =>
      val s = aggregate(zip_with(vec, sequence(lit(0), size(vec) - 1),
        (v, i) => v.cast("double") *
          when(pmod(xxhash64(lit(b), i), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(s >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN top-k via LSH buckets (multi-probe = exact bucket only here;
    * recall/latency trade documented): rank within bucket. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5, nBits: Int = 12,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), nBits).as("bucket")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), nBits).as("bucket"))
    val scored = q.join(c, Seq("bucket")).filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, candidates from LSH
    * buckets (never O(n²)). */
  def cosineDupPairs(corpus: DataFrame, threshold: Double = 0.95, nBits: Int = 10,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val withB = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), nBits).as("bucket"))
    val a = withB.select(col("bucket"), col("id").as("a"), col("v").as("va"))
    val b = withB.select(col("bucket"), col("id").as("b"), col("v").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("a") < col("b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("a").as("id_a"), col("b").as("id_b"), round(col("cos"), 4).as("cos"))
      .dropDuplicates("id_a", "id_b")
  }
}
