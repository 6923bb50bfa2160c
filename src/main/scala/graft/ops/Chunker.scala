package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-window document chunking with stride — the training-context cutter
  * that precedes sequence packing: long documents become overlapping
  * `window`-token chunks every `stride` tokens (overlap = window − stride
  * preserves cross-boundary context, the standard LM data prep move), short
  * tails are dropped unless they are the document's only chunk.
  *
  * Shape: pure scan-side row expansion — tokenize once, explode the start
  * offsets (a `sequence(0, n−1, stride)` literal-stepped ramp), slice the
  * token array per chunk. Zero shuffles, zero joins: a 100 TB chunking pass
  * runs at parquet scan rate and parallelizes embarrassingly. Expansion
  * factor is bounded by ~window/stride per input token, declared up front by
  * the parameters, never data-dependent.
  *
  * Determinism: chunk boundaries are exact integer arithmetic on token
  * offsets; the emitted `chunk_md5` fingerprints the space-joined chunk text
  * with a hash both engines implement identically, so the DuckDB oracle
  * re-derives every boundary AND every chunk's content byte-exactly.
  */
object Chunker {

  /** Chunks of `window` tokens every `stride` tokens over `textCol`, keyed
    * by `idCol`: (id, chunk_idx, start_tok, n_tokens, chunk_md5). A chunk
    * shorter than `minTail` is dropped unless chunk_idx == 0 (a document
    * shorter than the window still yields its whole self). Whitespace-only
    * documents yield no chunks. */
  def chunk(docs: DataFrame, window: Int, stride: Int, minTail: Int,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    require(minTail >= 1 && minTail <= window,
      s"need 1 <= minTail <= window, got minTail=$minTail")
    // guard mirrors the oracle's `WHERE length(trim(text)) > 0` exactly: SQL
    // trim strips only spaces, so a doc starting with a tab/newline is KEPT
    // and tokenizes with its leading empty token on both engines (the old
    // first-token-length guard silently dropped such docs). Split uses the
    // explicit whitespace class — Java \s also matches U+000B, RE2's doesn't.
    val toks = docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), split(lower(trim(col(textCol))), "[ \\t\\n\\f\\r]+").as("t"))
      .withColumn("n", size(col("t")).cast("long"))
    toks
      .select(col(idCol), col("t"), col("n"),
        posexplode(sequence(lit(0L), col("n") - 1L, lit(stride.toLong)))
          .as(Seq("chunk_idx", "start_tok")))
      .withColumn("n_tokens", least(lit(window.toLong), col("n") - col("start_tok")))
      .filter(col("chunk_idx") === 0 || col("n_tokens") >= minTail)
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_tok"), col("n_tokens"),
        md5(concat_ws(" ",
          slice(col("t"), (col("start_tok") + 1L).cast("int"), lit(window))))
          .as("chunk_md5"))
  }

  /** DuckDB oracle: same ramp, same slice, same md5. */
  def oracleSql(window: Int, stride: Int, minTail: Int,
                docsSql: String = "SELECT doc_id, text FROM documents"): String =
    s"""WITH d AS ($docsSql),
          toks AS (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\\s+') AS t
                   FROM d WHERE length(trim(text)) > 0),
          starts AS (SELECT doc_id, t, len(t) AS n,
                     unnest(range(0, len(t), $stride)) AS start_tok
                     FROM toks),
          c AS (SELECT doc_id, start_tok // $stride AS chunk_idx, start_tok,
                least($window, n - start_tok) AS n_tokens,
                md5(array_to_string(
                  list_slice(t, start_tok + 1, start_tok + $window), ' ')) AS chunk_md5
                FROM starts)
       SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
              CAST(start_tok AS BIGINT) AS start_tok,
              CAST(n_tokens AS BIGINT) AS n_tokens, chunk_md5
       FROM c WHERE chunk_idx = 0 OR n_tokens >= $minTail"""
}
