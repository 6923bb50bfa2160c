package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KMV / theta sketch for SET-INTERSECTION cardinality — the sketch family's
  * missing piece next to HLL (q47 does distinct-count; HLL cannot intersect).
  * "How many urls do two crawl snapshots share", "what fraction of corpus B's
  * shingles already exist in corpus A" at 10^12 elements — WITHOUT ever
  * joining the full sets: each side is reduced to its k minimum hash values
  * (a bounded TakeOrdered heap, k rows out of 10^12), and the two k-row
  * samples intersect broadcast-sized on the driver-free plan.
  *
  * Estimator (the standard theta intersection, Dasgupta et al.):
  * θ = min(θ_A, θ_B) where θ_S is the k-th smallest hash of S;
  * c = |{h ∈ S_A ∩ S_B : h < θ}|; estimate = c · M / θ with hashes uniform
  * in [0, M). Hashing is md5 — available bit-identically in both engines —
  * truncated to 15 hex chars (60 bits, fits BIGINT); samples and θ compare
  * as FIXED-LENGTH LOWERCASE HEX STRINGS (lexicographic = numeric order), so
  * the whole selection is exact string logic and the ONLY floats are the
  * final `(c·M)/θ` computed as two IEEE ops in a fixed order on both
  * engines — the estimate itself is deterministic and cross-engine
  * bit-identical, which is what makes a VALUE oracle possible for a sketch.
  *
  * Scale: per set one distinct-hash aggregation + one bounded heap
  * (TakeOrderedAndProject — never a global sort); everything after is
  * k-row arithmetic. Error is the standard ~1/√k; k is the accuracy knob.
  */
object ThetaSketch {

  private val HexLen = 15
  private val M = math.pow(16.0, HexLen) // 2^60, exactly representable

  /** The k lexicographically smallest distinct md5-prefix hashes of `c`. */
  def sketch(df: DataFrame, colName: String, k: Int): DataFrame = {
    require(k >= 16, s"k must be >= 16, got $k")
    df.select(substring(md5(col(colName).cast("string")), 1, HexLen).as("h"))
      .distinct().orderBy(col("h")).limit(k)
  }

  /** One row (k, theta_hex, n_common, est_intersect) estimating
    * |A ∩ B| over columns `aCol` of `a` and `bCol` of `b`. */
  def intersectEstimate(a: DataFrame, aCol: String,
                        b: DataFrame, bCol: String, k: Int): DataFrame = {
    val sa = sketch(a, aCol, k).localCheckpoint() // k rows, consumed twice
    val sb = sketch(b, bCol, k).localCheckpoint()
    val theta = sa.agg(max(col("h")).as("ta"))
      .crossJoin(sb.agg(max(col("h")).as("tb")))
      .select(least(col("ta"), col("tb")).as("theta"))
    val common = sa.join(sb, "h").crossJoin(broadcast(theta))
      .filter(col("h") < col("theta"))
      .agg(count(lit(1)).as("n_common"))
    common.crossJoin(broadcast(theta))
      .select(lit(k.toLong).as("k"), col("theta").as("theta_hex"), col("n_common"),
        (col("n_common").cast("double") * lit(M) /
          conv(col("theta"), 16, 10).cast("long").cast("double")).as("est_intersect"))
  }

  /** DuckDB oracle: identical selection in SQL (ORDER BY hash LIMIT k), the
    * same two-IEEE-op estimate; hex parses via the 0x cast. */
  def oracleSql(aSql: String, bSql: String, k: Int): String =
    s"""WITH sa AS (SELECT DISTINCT substring(md5(CAST(x AS VARCHAR)), 1, $HexLen) AS h
                    FROM ($aSql) ORDER BY h LIMIT $k),
          sb AS (SELECT DISTINCT substring(md5(CAST(x AS VARCHAR)), 1, $HexLen) AS h
                    FROM ($bSql) ORDER BY h LIMIT $k),
          theta AS (SELECT least((SELECT max(h) FROM sa), (SELECT max(h) FROM sb)) AS theta),
          c AS (SELECT count(*) AS n_common FROM sa JOIN sb USING (h)
                WHERE h < (SELECT theta FROM theta))
       SELECT CAST($k AS BIGINT) AS k, (SELECT theta FROM theta) AS theta_hex,
              CAST(n_common AS BIGINT) AS n_common,
              CAST(n_common AS DOUBLE) * ${M.toLong}.0
                / CAST(CAST('0x' || (SELECT theta FROM theta) AS BIGINT) AS DOUBLE)
                AS est_intersect
       FROM c"""
}
