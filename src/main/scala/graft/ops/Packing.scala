package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing — the "concat-and-chunk" layout every
  * GPT-style pretraining run performs before batching: documents are laid
  * end-to-end in a canonical order (doc_id) and cut into fixed `budget`-token
  * training sequences. The operator emits, per document, its global token
  * offset and the range of training sequences it lands in, which is exactly
  * what a downstream sharded writer needs to materialize packed examples.
  *
  * Scale design — a distributed prefix sum, NOT a global window. A naive
  * `sum over (order by doc_id)` funnels the whole corpus through a single
  * window partition; at 100 TB that is one task. Instead:
  *
  *   1. chunk docs into `groupSize`-wide doc_id groups (a pure scan-side
  *      column, no shuffle);
  *   2. aggregate per-group token totals (one shuffle over ~n/groupSize
  *      rows);
  *   3. run the global running-offset window over the per-group totals only
  *      — for a trillion-doc corpus at groupSize 4096 that is ~2.4e8 slim
  *      rows through the single-partition window, and raising `groupSize`
  *      shrinks it linearly;
  *   4. join the group offsets back (AQE broadcasts when the group table is
  *      small; past broadcast size it degrades to a shuffle join on `grp`)
  *      and finish with a `partitionBy(grp)` window, which parallelizes
  *      across groups.
  *
  * The result depends only on the canonical doc_id order, never on physical
  * partitioning — bit-identical across parallelism levels and engines.
  */
object Packing {

  /** Per-doc packing layout under a `budget`-token sequence size.
    * Output: doc_id, n_tokens, tok_offset (global start), seq_start,
    * seq_end (inclusive training-sequence ids), n_seqs. Empty docs occupy
    * zero tokens and report the boundary sequence they sit at. */
  def packOffsets(docs: DataFrame, budget: Long, groupSize: Long = 4096): DataFrame =
    packOffsetsCounted(docs.select(col("doc_id"),
      TextStats.tokenCount(col("text")).cast("long").as("n_tokens")), budget, groupSize)

  /** [[packOffsets]] over units whose token counts are ALREADY known —
    * (doc_id, n_tokens) rows. This is how pre-chunked corpora pack (the
    * chunk manifest carries n_tokens; re-tokenizing the text would both
    * cost a scan and disagree with the chunker's boundaries). */
  def packOffsetsCounted(units: DataFrame, budget: Long,
                         groupSize: Long = 4096): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(groupSize >= 1, s"groupSize must be >= 1, got $groupSize")
    val toks = units.select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
      .withColumn("grp", floor(col("doc_id") / lit(groupSize)).cast("long"))
    val grpTotals = toks.groupBy(col("grp")).agg(sum(col("n_tokens")).as("grp_tokens"))
    // global running offset over the per-group totals: 1/groupSize of the
    // data through the one single-partition window in the plan
    val wg = Window.orderBy(col("grp")).rowsBetween(Window.unboundedPreceding, -1)
    val grpOffsets = grpTotals.select(col("grp"),
      coalesce(sum(col("grp_tokens")).over(wg), lit(0L)).as("grp_offset"))
    val wi = Window.partitionBy(col("grp")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // no broadcast hint on grpOffsets: at the documented trillion-doc scale
    // the group table is ~corpus/groupSize rows — far past broadcastable —
    // so the join must be allowed to degrade to a shuffle join on `grp`
    // (AQE still broadcasts when the table is actually small, the common
    // case; raising groupSize shrinks it linearly when it isn't)
    toks.join(grpOffsets, Seq("grp"))
      .withColumn("tok_offset",
        col("grp_offset") + coalesce(sum(col("n_tokens")).over(wi), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("tok_offset"),
        expr(s"tok_offset div $budget").as("seq_start"),
        when(col("n_tokens") === 0, expr(s"tok_offset div $budget"))
          .otherwise(expr(s"(tok_offset + n_tokens - 1) div $budget")).as("seq_end"))
      .withColumn("n_seqs", col("seq_end") - col("seq_start") + lit(1L))
  }
}
