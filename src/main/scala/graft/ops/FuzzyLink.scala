package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typo-tolerant alias matching — the fuzzy entity-linking primitive: match
  * query surfaces against a dictionary at edit distance ≤ 1 (covers the
  * dominant OCR/typo/crawl-noise class) WITHOUT the all-pairs levenshtein
  * scan that is quadratic in vocabulary.
  *
  * Blocking is the FastSS deletion neighborhood (Bocek et al. 2007): each
  * string emits itself plus every single-character deletion as join keys.
  * Two strings at edit distance ≤ 1 ALWAYS share a key — equal strings share
  * the identity key, a deletion pair shares the shorter string, and a
  * substitution pair shares the both-sides-deleted string — so unlike
  * first-char/length-band blocking the candidate generation has EXACT
  * recall, machine-checkable against a brute-force oracle. Cost is
  * (len+1) slim key rows per string and a hash equi-join; the verify step
  * runs codegen'd `levenshtein` on candidates only. Hot keys are bounded by
  * the alphabet at short lengths and by near-duplicate mass otherwise — the
  * same postings-list shape as every dedup miner, and a `maxBucket`-style
  * cap is unnecessary because a key's strings must agree on length ±1.
  *
  * Candidate pairs can share several keys (e.g. equal strings share every
  * key), so the join result is distinct-collapsed on the pair before the
  * verify — exactly-once output at any parallelism.
  */
object FuzzyLink {

  /** The string itself + each single-character deletion (len+1 keys). */
  private[ops] def deletionKeys(c: Column): Column =
    transform(sequence(lit(0), length(c)),
      i => concat(c.substr(lit(1), i), c.substr(i + lit(2), length(c))))

  /** All (query, word, dist) with levenshtein(query, word) <= 1, for
    * `queries` column `qCol` against dictionary column `wCol`. Inputs are
    * distinct-collapsed; output pairs are exact and exactly-once. */
  def matchEd1(queries: DataFrame, dict: DataFrame,
               qCol: String = "query", wCol: String = "word"): DataFrame = {
    val q = queries.select(col(qCol).as("query")).distinct()
      .withColumn("__k", explode(deletionKeys(col("query"))))
    val d = dict.select(col(wCol).as("word")).distinct()
      .withColumn("__k", explode(deletionKeys(col("word"))))
    q.join(d, "__k")
      .select("query", "word").distinct()
      .filter(levenshtein(col("query"), col("word")) <= 1)
      .select(col("query"), col("word"),
        levenshtein(col("query"), col("word")).cast("long").as("dist"))
  }
}
