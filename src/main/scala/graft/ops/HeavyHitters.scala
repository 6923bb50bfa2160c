package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact heavy-hitter word n-grams via a two-pass count-min sketch
  * (Cormode & Muthukrishnan 2005) — the corpus-statistics primitive behind
  * boilerplate detection (navigation strings repeated across millions of
  * pages), template mining, and stop-phrase lists.
  *
  * Why not one `GROUP BY gram HAVING count >= T`? At 100 TB the DISTINCT
  * n-gram count is corpus-sized (hundreds of billions of keys) — the single
  * exact aggregation shuffles essentially the whole corpus as strings. The
  * sketch pass instead map-side-combines into a FIXED d×w counter matrix
  * (partial aggregation emits at most d·w rows per task regardless of input
  * size), the matrix broadcasts back at a few KB, and the exact second pass
  * counts ONLY the occurrences whose sketch estimate clears the threshold —
  * a shuffle bounded by the true-heavy mass plus the CMS collision
  * overestimate (ε = e/w of total mass per row, standard bound), not by the
  * corpus.
  *
  * EXACTNESS: CMS never underestimates, so pass-1 candidates are a strict
  * superset of the true heavy set, and the pass-2 exact `HAVING` makes the
  * final answer EXACT — which is what lets a plain SQL `GROUP BY/HAVING`
  * serve as the cross-engine value oracle for the whole two-pass plan.
  *
  * The per-occurrence sketch lookup is d chained BROADCAST hash joins
  * (one per CMS row) + a `least()` — all map-side, inside whole-stage
  * codegen; no shuffle touches a non-candidate occurrence.
  */
object HeavyHitters {

  /** Word n-gram OCCURRENCES (not per-doc distinct — heavy hitters count
    * total frequency) as strings, over [[TextStats.words]] tokens; docs
    * shorter than n contribute nothing. */
  def gramStrings(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.WordGramsExpression(
        org.apache.spark.sql.GraftColumnBridge.expression(text), n))

  /** The HOF formulation [[gramStrings]]' native kernel replaced — kept as
    * the parity reference (HeavyHittersSpec gates bit-identity; the kernel
    * is one generated loop per row instead of an interpreted ArrayTransform
    * with a concat_ws+slice per gram, the dominant scan cost of q76). */
  private[graft] def gramStringsHof(text: Column, n: Int): Column = {
    val toks = TextStats.words(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** All word n-grams occurring at least `minCount` times across the corpus,
    * with their EXACT counts. `d` (rows) and `w` (buckets/row) size the
    * sketch, and sizing is LOAD-BEARING: a row's expected bucket load is
    * totalMass/w, and once that approaches `minCount` every bucket clears
    * the threshold, the filter passes everything, and pass 2 silently
    * degenerates to the full exact aggregation (benchmarked: w=1024 against
    * ~10⁶ grams made q76 the most expensive query in the sweep). Pick
    * w ≳ 50·totalMass/minCount. The default suits the test SFs; a 100 TB
    * run wants w ~ 2^26 — d·w·8 B ≈ 2 GB sketch, still broadcastable after
    * the (j,bucket) agg, and 9 orders below the distinct-gram table the
    * exact one-pass plan would shuffle. */
  def heavyGrams(docs: DataFrame, n: Int, minCount: Long,
                 d: Int = 4, w: Int = 1 << 17,
                 textCol: String = "text"): DataFrame =
    heavyGramsWith(docs, n, minCount, d, w, textCol, gramStrings)

  private[graft] def heavyGramsWith(docs: DataFrame, n: Int, minCount: Long,
                 d: Int, w: Int, textCol: String,
                 gramFn: (Column, Int) => Column): DataFrame = {
    require(d >= 1 && w >= 2, s"degenerate sketch d=$d w=$w")
    // occurrences with their 8-byte key: recomputed per pass (scan-rate
    // column work — persisting a corpus-sized explode would be the mistake)
    def occ = docs.select(explode(gramFn(col(textCol), n)).as("gram"))
      .select(col("gram"), xxhash64(col("gram")).as("gh"))

    // pass 1: the d×w counter matrix. The explode multiplies scan rows ×d
    // BEFORE the aggregation, but partial agg collapses each task's output
    // to ≤ d·w rows — the fixed-size-sketch property.
    val sketch = occ
      .select(explode(sequence(lit(0), lit(d - 1))).as("j"), col("gh"))
      .groupBy(col("j"), pmod(xxhash64(col("gh"), col("j")), lit(w)).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // d·w rows; reused d times below — compute once

    // pass 2: per-occurrence estimate = min over the d rows, via d broadcast
    // joins (each against a ≤w-row slice); absent bucket ⇒ count 0
    var cur = occ
    val estCols = (0 until d).map { j =>
      val skj = sketch.filter(col("j") === j)
        .select(col("bucket").as(s"b$j"), col("cnt").as(s"c$j"))
      cur = cur.join(broadcast(skj),
        pmod(xxhash64(col("gh"), lit(j)), lit(w)) === col(s"b$j"), "left")
      coalesce(col(s"c$j"), lit(0L))
    }
    val est = if (d == 1) estCols.head else least(estCols: _*)
    cur.filter(est >= minCount)
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** The exact one-agg DuckDB formulation — the oracle the sketch plan must
    * reproduce verbatim (same tokenization as every text oracle). */
  def oracleSql(n: Int, minCount: Long, table: String = "documents"): String =
    s"""WITH toks AS (SELECT CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END AS t
                      FROM $table),
            gi AS (SELECT t, unnest(range(1, len(t) - ${n - 2})) AS i FROM toks),
            grams AS (SELECT array_to_string(t[i : i + ${n - 1}], ' ') AS gram FROM gi)
       SELECT gram, count(*) AS cnt FROM grams GROUP BY 1
       HAVING count(*) >= $minCount"""
}
