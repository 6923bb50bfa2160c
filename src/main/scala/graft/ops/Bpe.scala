package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding (BPE) tokenizer training and application —
  * the vocabulary-learning step a pretraining data pipeline runs before
  * token-budget accounting and sequence packing. GPT-2-style BYTE-level
  * symbols: the initial alphabet is the UTF-8 bytes of each word (rendered
  * as 2-char uppercase hex so every symbol — base or merged — is a plain
  * string both engines agree on), merges concatenate hex strings, and one
  * merge pass replaces adjacent occurrences greedily left-to-right without
  * overlap (the reference BPE semantics: "aaaa" + merge(a,a) → (aa)(aa),
  * "aaa" → (aa)(a)).
  *
  * Scale design — the corpus is scanned ONCE, for word frequencies. The
  * whole iterative part runs on the word-frequency table (vocabulary-sized:
  * bounded by distinct words, not corpus bytes — exactly how single-node BPE
  * trainers scale, re-expressed as Spark aggregations). Each learn iteration
  * is one slim (pair, freq) shuffle plus a 1-row `collect()` of the argmax
  * pair (driver state = the merge list itself, bounded by `nMerges`).
  * `localCheckpoint` per iteration keeps the plan from doubling (the same
  * discipline as PageRank/ConnectedComponents). Encoding applies the fold
  * to each DISTINCT word once and joins the per-word token count back to
  * occurrences, so the per-word fold cost never multiplies by term
  * frequency.
  */
object Bpe {

  /** `functions.encode(_, "UTF-8")` — named to dodge the shadow from this
    * object's own `encode` (the corpus encoder below). */
  private def utf8(c: Column): Column =
    org.apache.spark.sql.functions.encode(c, "UTF-8")

  /** Word frequencies over the canonical tokenization: ONE corpus scan,
    * then everything downstream is vocabulary-sized. */
  def wordFreqs(docs: DataFrame): DataFrame =
    docs.select(explode(TextStats.words(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbol sequence of a word: its UTF-8 bytes as 2-char uppercase
    * hex strings ("the" → ["74","68","65"]). Byte-level (not char-level) so
    * multibyte scripts need no engine-specific unicode semantics: Spark and
    * DuckDB agree on `hex(encode(word))` byte for byte. */
  def symbols(word: Column): Column =
    split(trim(regexp_replace(hex(utf8(word)), "(..)", "$1 ")), " ")

  /** Adjacent-pair statistics over the current symbol sequences, weighted by
    * word frequency — BPE training's inner counting step, exposed as the
    * oracled query (iteration 0: base byte pairs). Deterministic under ties:
    * ordered by (count desc, pair asc). */
  def pairStats(docs: DataFrame, topN: Int): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    pairCounts(wordFreqs(docs).withColumn("syms", symbols(col("word"))))
      .orderBy(desc("cnt"), asc("pair")).limit(topN)
  }

  /** (pair "a b", summed freq) over a (freq, syms) table. */
  private def pairCounts(vocab: DataFrame): DataFrame = {
    val n = size(col("syms"))
    vocab.filter(n >= 2)
      .select(col("freq"), explode(arrays_zip(
        slice(col("syms"), lit(1), n - 1),
        slice(col("syms"), lit(2), n - 1))).as("z"))
      .select(concat(col("z.0"), lit(" "), col("z.1")).as("pair"), col("freq"))
      .groupBy("pair").agg(sum("freq").cast("long").as("cnt"))
  }

  /** One greedy left-to-right merge pass over a symbol array: every
    * non-overlapping adjacent (a, b) becomes the concatenated symbol. A pure
    * codegen'd `aggregate` fold — no UDF. The short-word quadratic append is
    * bounded by word length (bytes), not corpus size. */
  def mergeOnce(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && (x === lit(b)),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Apply an ordered merge list (each merge fully, in sequence — the BPE
    * application order contract). */
  def applyMerges(syms: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(syms) { case (c, (a, b)) => mergeOnce(c, a, b) }

  /** Learn `nMerges` BPE merges: at each step take the most frequent
    * adjacent pair over the (vocab-sized) symbol table (ties broken by pair
    * text — fully deterministic, parallelism-independent) and merge it
    * everywhere. Stops early when no pair remains.
    *
    * Hybrid execution — the [[IvfIndex]] bounded-collect discipline: the
    * iterative part of BPE is vocabulary-sized by construction, so when the
    * word-frequency table fits `maxFitWords` (one probing collect decides —
    * real corpora have a few million distinct words after the frequency
    * aggregation), it is collected ONCE and the merges are learned by the
    * driver-side incremental trainer: only the pair counts touched by the
    * previous merge are updated per iteration, so a production 32k-merge
    * vocabulary costs ONE Spark job total instead of 32k sequential
    * jobs' scheduler latency. Vocabularies past the bound take the fully
    * distributed path (one slim pair-count job per merge). Both paths are
    * merge-by-merge identical (BpeSpec parity-gates them against each other
    * and the brute-force reference). */
  def learnMerges(docs: DataFrame, nMerges: Int,
                  maxFitWords: Int = 4000000): Seq[(String, String)] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val wf = wordFreqs(docs)
    // one job: collect at most maxFitWords+1 aggregated rows — getting fewer
    // than the cap proves we hold the COMPLETE frequency table
    val probe = wf.limit(maxFitWords + 1).collect()
    if (probe.length <= maxFitWords)
      return learnMergesLocal(
        probe.map(r => (r.getString(0), r.getLong(1))).toIndexedSeq, nMerges)
    var vocab = wf.select(col("freq"), symbols(col("word")).as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < nMerges) {
      val top = pairCounts(vocab).orderBy(desc("cnt"), asc("pair")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val parts = top(0).getAs[String]("pair").split(" ", 2)
        val (a, b) = (parts(0), parts(1))
        merges += ((a, b))
        vocab = vocab.withColumn("syms", mergeOnce(col("syms"), a, b)).localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** Driver-side incremental BPE over a COMPLETE (word, freq) table: classic
    * single-node trainer semantics, maintained incrementally — per merge,
    * only words containing the merged pair are re-counted. Pair ordering
    * matches the distributed path bit for bit: the argmax compares the
    * concatenated "a b" STRING (the separator 0x20 sorts below every hex
    * symbol char, so this equals the (a, b) tuple order the hex alphabet
    * implies — and it is exactly what `orderBy(desc(cnt), asc(pair))`
    * compares). */
  private def learnMergesLocal(wordFreqs: IndexedSeq[(String, Long)],
                               nMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    // vocab as mutable symbol buffers; initial symbols = UTF-8 bytes as hex
    val vocab = wordFreqs.map { case (w, f) =>
      (mutable.ArrayBuffer.from(w.getBytes("UTF-8").map(b => f"${b & 0xff}%02X")), f)
    }
    val counts = mutable.HashMap.empty[String, Long]
    // pair → words that contained it when last touched (entries go stale
    // after merges; staleness only costs a no-op visit, never correctness,
    // because the count delta is always recomputed from the CURRENT symbols)
    val postings = mutable.HashMap.empty[String, mutable.Set[Int]]
    def eachPair(syms: mutable.ArrayBuffer[String])(f: String => Unit): Unit = {
      var j = 0
      while (j + 1 < syms.length) { f(syms(j) + " " + syms(j + 1)); j += 1 }
    }
    def bump(pair: String, delta: Long): Unit = {
      val c = counts.getOrElse(pair, 0L) + delta
      if (c == 0L) counts.remove(pair) else counts(pair) = c
    }
    vocab.indices.foreach { i =>
      val (syms, f) = vocab(i)
      eachPair(syms) { p => bump(p, f); postings.getOrElseUpdate(p, mutable.Set.empty) += i }
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    while (merges.length < nMerges && counts.nonEmpty) {
      // argmax by (count desc, pair string asc) — the distributed ordering
      var bestPair: String = null
      var bestCnt = Long.MinValue
      counts.foreach { case (p, c) =>
        if (c > bestCnt || (c == bestCnt && p < bestPair)) { bestPair = p; bestCnt = c }
      }
      val Array(a, b) = bestPair.split(" ", 2)
      merges += ((a, b))
      val merged = a + b
      postings.getOrElse(bestPair, mutable.Set.empty).foreach { i =>
        val (syms, f) = vocab(i)
        // subtract the word's current pairs, apply the greedy
        // left-to-right non-overlapping merge in place, add the new pairs
        eachPair(syms)(bump(_, -f))
        var r = 0; var w = 0
        while (r < syms.length) {
          if (r + 1 < syms.length && syms(r) == a && syms(r + 1) == b) {
            syms(w) = merged; r += 2
          } else { syms(w) = syms(r); r += 1 }
          w += 1
        }
        syms.takeInPlace(w)
        eachPair(syms) { p =>
          bump(p, f); postings.getOrElseUpdate(p, mutable.Set.empty) += i
        }
      }
      postings.remove(bestPair)
      counts.remove(bestPair) // defensive: the subtract loop already zeroed it
    }
    merges.toSeq
  }

  /** Encode the corpus under a fixed merge list: per doc, total UTF-8 bytes
    * and total BPE token count (the real token-budget number that packing
    * and mixture accounting consume). Distinct words are encoded once —
    * the k-merge fold never multiplies by term frequency. `broadcastVocab`
    * broadcasts the encoded vocabulary back onto occurrences (right up to
    * ~10M distinct words); at web-corpus vocabulary sizes pass false and
    * the same plan degrades to a hash-partitioned join on `word`, which is
    * naturally skew-free (hot words join to exactly one vocab row). */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
             broadcastVocab: Boolean = true): DataFrame = {
    val occurrences = docs
      .select(col("doc_id"), explode(TextStats.words(col("text"))).as("word"))
      .filter(col("word") =!= "")
    val vocab = occurrences.select("word").distinct()
      .select(col("word"),
        length(utf8(col("word"))).cast("long").as("n_bytes"),
        size(applyMerges(symbols(col("word")), merges)).cast("long").as("n_tok"))
    occurrences.join(if (broadcastVocab) broadcast(vocab) else vocab, Seq("word"))
      .groupBy("doc_id")
      .agg(sum("n_bytes").cast("long").as("n_bytes"),
        sum("n_tok").cast("long").as("n_bpe_tokens"))
  }

  /** DuckDB oracle for `pairStats`. */
  def oracleSqlPairs(topN: Int): String =
    s"""WITH wx AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
              FROM documents WHERE length(trim(text)) > 0),
         wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM wx WHERE word <> '' GROUP BY word),
         sy AS (SELECT freq, regexp_split_to_array(trim(regexp_replace(hex(encode(word)), '(..)', '\\1 ', 'g')), ' ') AS syms FROM wf),
         pr AS (SELECT freq, unnest(syms[1:len(syms)-1]) AS a, unnest(syms[2:len(syms)]) AS b FROM sy WHERE len(syms) >= 2)
       SELECT a || ' ' || b AS pair, CAST(sum(freq) AS BIGINT) AS cnt
       FROM pr GROUP BY 1 ORDER BY cnt DESC, pair LIMIT $topN"""

  /** DuckDB oracle for `encode`: the merge fold restated as a chain of
    * plain `replace` calls over a DOUBLE-space-delimited symbol string.
    * With double-space delimiters, one replace pass has exactly the greedy
    * non-overlapping semantics of the fold: each match consumes one of the
    * two boundary spaces on each side, so chains of adjacent pairs all merge
    * ("anan" → 616E 616E) while overlaps don't ("aaa" → 6161 61) — validated
    * against a brute-force fold before wiring. An independent FORMULATION,
    * not a port of the Spark fold. */
  def oracleSqlEncode(merges: Seq[(String, String)]): String = {
    val chain = merges.foldLeft(
      """'  ' || regexp_replace(hex(encode(word)), '(..)', '\1  ', 'g')""") {
      case (s, (a, b)) => s"replace($s, ' $a  $b ', ' $a$b ')"
    }
    s"""WITH wx AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
              FROM documents WHERE length(trim(text)) > 0),
         enc AS (SELECT doc_id, octet_length(encode(word)) AS n_bytes,
                 len(regexp_split_to_array(trim($chain), ' +')) AS n_tok
                 FROM wx WHERE word <> '')
       SELECT doc_id, CAST(sum(n_bytes) AS BIGINT) AS n_bytes,
              CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens
       FROM enc GROUP BY doc_id"""
  }
}
