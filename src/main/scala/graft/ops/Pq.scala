package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011) — the fourth leg of the ANN
  * shelf (brute / LSH / IVF / PQ) and the one that makes 100 TB of
  * embeddings SEARCHABLE IN MEMORY: each vector compresses to m small
  * integer codes (m·⌈log2 k⌉ bits ≈ a few bytes vs dim·4 B floats), and
  * asymmetric-distance (ADC) search scans codes against per-query distance
  * tables instead of touching the float vectors at all.
  *
  * Construction reuses the whole [[Kmeans]] discipline verbatim, once per
  * subspace: deterministic fixed-point Lloyd over the corpus (exact Long
  * distances, floor-division centroid updates, min-id seeds, lowest-index
  * ties), so codebooks, codes, and ADC distances are ALL exact integers —
  * bit-identical at any partitioning and reproducible CTE-by-CTE by the
  * DuckDB oracle (two prefixed [[Kmeans.oracleCtes]] chains + integer ADC).
  *
  * Scale design: encoding is ONE scan with m native argmin kernels
  * ([[graft.plans.KmeansArgminExpression]]) over slices of the quantized
  * vector — no joins, no shuffle, no per-subspace pass. ADC search
  * evaluates per-query distance tables as LITERAL arrays (k·m longs per
  * query, built driver-side from the collected codebooks — the IvfIndex
  * bounded-collect discipline; queries are a handful of rows by contract)
  * and `element_at` lookups inside the scan projection, then one bounded
  * TopKPerKey exchange ranks candidates per query. The corpus shuffles
  * (query_id, vec_id, dist) triples only — never vectors, never codes.
  */
object Pq {

  /** One k-codebook per subspace, each fit by [[Kmeans.fit]] over that
    * slice of the corpus. `dim` must split evenly into `m` subspaces. */
  def fitCodebooks(embeddings: DataFrame, m: Int, k: Int, iters: Int,
                   dim: Int, scale: Long = 1000000L,
                   idCol: String = "vec_id", vecCol: String = "embedding")
      : IndexedSeq[IndexedSeq[Array[Long]]] = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    val subDim = dim / m
    (0 until m).map { s =>
      Kmeans.fit(embeddings.select(col(idCol).as("vec_id"),
        slice(col(vecCol), s * subDim + 1, subDim).as("embedding")),
        k, iters, scale)
    }.toIndexedSeq
  }

  /** PQ codes: (vec_id, code0 … code{m-1}) in one scan — m argmin kernels
    * over slices of the one quantized array, zero joins. */
  def encode(embeddings: DataFrame, codebooks: IndexedSeq[IndexedSeq[Array[Long]]],
             dim: Int, scale: Long = 1000000L,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val subDim = dim / codebooks.length
    val q = Kmeans.quantize(col(vecCol), scale)
    val codeCols = codebooks.zipWithIndex.map { case (cb, s) =>
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.plans.KmeansArgminExpression(
          org.apache.spark.sql.GraftColumnBridge.expression(
            slice(q, s * subDim + 1, subDim)),
          cb.map(_.clone).toArray))
        .getField("cluster").as(s"code$s")
    }
    embeddings.select(col(idCol).cast("long").as("vec_id") +: codeCols: _*)
  }

  /** Exact integer ADC table for one quantized query vector: per subspace,
    * the squared distance to each of the k centroids. */
  private def distTable(qq: Array[Long], cb: IndexedSeq[Array[Long]],
                        s: Int, subDim: Int): Seq[Long] =
    cb.map { cent =>
      var d = 0L
      var i = 0
      while (i < subDim) {
        val t = qq(s * subDim + i) - cent(i)
        d += t * t
        i += 1
      }
      d
    }

  /** Fit + encode + ADC top-k of every query against the corpus:
    * (query_id, rank, vec_id, adc_dist). `queries` must be a SMALL relation
    * (vec_id + embedding) — it is collected driver-side to build the
    * literal distance tables. */
  def adcTopK(embeddings: DataFrame, queries: DataFrame, m: Int, k: Int,
              iters: Int, topk: Int, dim: Int,
              scale: Long = 1000000L): DataFrame = {
    val subDim = dim / m
    val cbs = fitCodebooks(embeddings, m, k, iters, dim, scale)
    val enc = encode(embeddings, cbs, dim, scale)
    val qrows = queries
      .select(col("vec_id").cast("long"), Kmeans.quantize(col("embedding"), scale))
      .collect()
    require(qrows.nonEmpty, "ADC search needs at least one query vector")
    val perQuery: Seq[Column] = qrows.toSeq.map { r =>
      val qq = r.getSeq[Long](1).toArray
      val dist = (0 until m).map { s =>
        element_at(typedLit(distTable(qq, cbs(s), s, subDim)),
          col(s"code$s").cast("int") + 1)
      }.reduce(_ + _)
      struct(lit(r.getLong(0)).as("query_id"), dist.as("adc_dist"))
    }
    val scored = enc
      .select(col("vec_id"), explode(array(perQuery: _*)).as("e"))
      .select(col("e.query_id").as("query_id"), col("vec_id"),
        col("e.adc_dist").as("adc_dist"))
    graft.plans.TopK.perKey(scored, Seq(col("query_id")),
        Seq(asc("adc_dist"), asc("vec_id")), topk, rnName = "rank")
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("adc_dist"))
  }

  /** DuckDB oracle: two prefixed kmeans chains (one per subspace) recompute
    * codebooks and codes, integer ADC tables join back by code, window
    * ranks per query. `queryWhere` selects the query vectors from the same
    * table. Only m=2 is generated (the q78 configuration). */
  def oracleSql(k: Int, iters: Int, dim: Int, topk: Int, queryWhere: String,
                scale: Long = 1000000L, table: String = "embeddings"): String = {
    val subDim = dim / 2
    def dt(p: String) =
      s"""SELECT q.vec_id AS query_id, c.j,
            sum((q.q[g.i] - c.c[g.i]) * (q.q[g.i] - c.c[g.i])) AS d
          FROM ${p}qv q JOIN qids USING (vec_id), ${p}c$iters c,
               generate_series(1, $subDim) AS g(i)
          GROUP BY 1, 2"""
    s"""WITH p0src AS (SELECT vec_id, embedding[1:$subDim] AS embedding FROM $table),
          p1src AS (SELECT vec_id, embedding[${subDim + 1}:$dim] AS embedding FROM $table),
          ${Kmeans.oracleCtes(k, iters, subDim, scale, srcRel = "p0src", prefix = "p0")},
          ${Kmeans.oracleCtes(k, iters, subDim, scale, srcRel = "p1src", prefix = "p1")},
          qids AS (SELECT vec_id FROM $table WHERE $queryWhere),
          dt0 AS (${dt("p0")}),
          dt1 AS (${dt("p1")}),
          adc AS (SELECT dt0.query_id, a0.vec_id, dt0.d + dt1.d AS adc_dist
                  FROM p0af a0
                  JOIN p1af a1 USING (vec_id)
                  JOIN dt0 ON dt0.j = a0.cluster
                  JOIN dt1 ON dt1.j = a1.cluster AND dt1.query_id = dt0.query_id)
       SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY adc_dist, vec_id) AS BIGINT) AS rank,
              vec_id, CAST(adc_dist AS BIGINT) AS adc_dist
       FROM adc
       QUALIFY row_number() OVER (PARTITION BY query_id
                ORDER BY adc_dist, vec_id) <= $topk"""
  }
}
