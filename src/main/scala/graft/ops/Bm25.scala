package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword search over a document corpus (Robertson/Spärck-Jones
  * probabilistic ranking, the Okapi/Lucene formulation): for each query —
  * a small fixed bag of terms — score every document and return the top-k.
  *
  * Scale design (two scans, one bounded shuffle, NO inverted-index
  * materialization needed for fixed query sets):
  *  1. corpus-stats pass: ONE aggregation computes N, avgdl and the df of
  *     every query term (term frequencies via `size(filter(words, ...))`
  *     inside the scan — zero explode, zero per-term shuffle). The result
  *     is a single row, cross-joined back (AQE broadcasts it).
  *  2. scoring pass: per-doc score is a single codegen'd expression — a
  *     FIXED-ORDER sum over the query's terms, which keeps the double
  *     arithmetic bit-reproducible across partitionings and engines (a
  *     groupBy-sum over per-term rows would sum in partition order).
  *  3. ranking: the bounded-heap top-k operator (graft.plans.TopKPerKey) —
  *     k survivors per query cross the exchange, not N docs.
  *
  * idf uses the Lucene BM25 form ln(1 + (N - df + 0.5)/(df + 0.5)),
  * always positive.
  */
object Bm25 {

  private def words(text: Column): Column = TextStats.words(text)

  /** Occurrences of `term` in the doc's token array — scan-side, no explode. */
  def termFreq(ws: Column, term: String): Column =
    size(filter(ws, w => w === lit(term)))

  /** Top-k BM25 results for `queries` (query_id → bag of terms) over
    * `docs(doc_id, text)`. Output: (query_id, rnk, doc_id, score), ties
    * broken by ascending doc_id. */
  def search(docs: DataFrame, queries: Seq[(Long, Seq[String])], k: Int = 5,
             k1: Double = 1.2, b: Double = 0.75,
             textCol: String = "text"): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "every query needs a non-empty term list")
    require(queries.map(_._1).distinct.length == queries.length,
      "query ids must be distinct (they name the per-query score columns)")
    val allTerms: Seq[String] = queries.flatMap(_._2).distinct.sorted
    // tokenize ONCE per scan as a real column: every per-term tf expression
    // below references the attribute, so splitting is not left to codegen
    // subexpression elimination (an optimizer-behavior dependency)
    val ws = col("__ws")
    val docsW = docs.withColumn("__ws", words(col(textCol)))

    // pass 1: N, avgdl, df per query term — one aggregation row
    val statAggs =
      count(lit(1)).cast("double").as("n_docs") +:
        avg(size(ws).cast("double")).as("avgdl") +:
        allTerms.zipWithIndex.map { case (term, i) =>
          sum(when(termFreq(ws, term) > 0, 1.0).otherwise(0.0)).as(s"df_$i")
        }
    val stats = docsW.agg(statAggs.head, statAggs.tail: _*)

    // pass 2: fixed-order per-query score expressions over the broadcast stats
    val withStats = docsW.crossJoin(broadcast(stats))
    val dl = size(ws).cast("double")
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * dl / col("avgdl"))
    def termScore(term: String): Column = {
      val i = allTerms.indexOf(term)
      val idf = log(lit(1.0) + (col("n_docs") - col(s"df_$i") + lit(0.5)) /
        (col(s"df_$i") + lit(0.5)))
      val tf = termFreq(ws, term).cast("double")
      idf * tf * lit(k1 + 1.0) / (tf + norm)
    }
    // all query scores in ONE corpus scan: wide per-query score columns
    // (each a fixed-order sum — sorted terms, left fold — for bit-stable
    // doubles), then unpivot to (query_id, doc_id, score) rows
    val scoreCols = queries.map { case (qid, terms) =>
      terms.sorted.map(termScore).reduce(_ + _).as(s"q$qid")
    }
    val wide = withStats.select(col("doc_id") +: scoreCols: _*)
    val scoredPerQuery = wide
      .unpivot(Array(col("doc_id")), queries.map { case (qid, _) => col(s"q$qid") }.toArray,
        "qname", "score")
      .select(substring(col("qname"), 2, 20).cast("long").as("query_id"),
        col("doc_id"), col("score"))

    graft.plans.TopK.perKey(scoredPerQuery.filter(col("score") > 0),
        Seq(col("query_id")), Seq(desc("score"), asc("doc_id")), k, rnName = "rnk")
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("doc_id"), round(col("score"), 4).as("score"))
  }

  /** DuckDB oracle SQL for the same search — identical formula, identical
    * fixed-order additions, so the doubles match bit-for-bit. */
  def oracleSql(queries: Seq[(Long, Seq[String])], k: Int = 5,
                k1: Double = 1.2, b: Double = 0.75,
                table: String = "documents"): String = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "every query needs a non-empty term list")
    require(queries.map(_._1).distinct.length == queries.length,
      "query ids must be distinct")
    val allTerms = queries.flatMap(_._2).distinct.sorted
    def tfSql(term: String) =
      s"len(list_filter(words, w -> w = '$term'))"
    val dfSelects = allTerms.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN ${tfSql(t)} > 0 THEN 1.0 ELSE 0.0 END) AS df_$i"
    }.mkString(", ")
    def scoreSql(terms: Seq[String]) = terms.sorted.map { t =>
      val i = allTerms.indexOf(t)
      s"(ln(1.0 + (n_docs - df_$i + 0.5) / (df_$i + 0.5)) * ${tfSql(t)} * ${k1 + 1.0} " +
        s"/ (${tfSql(t)} + $k1 * ((1.0 - $b) + $b * len(words) / avgdl)))"
    }.mkString(" + ")
    val perQuery = queries.map { case (qid, terms) =>
      s"SELECT CAST($qid AS BIGINT) AS query_id, doc_id, ${scoreSql(terms)} AS score FROM w CROSS JOIN stats"
    }.mkString(" UNION ALL ")
    s"""WITH w AS (SELECT doc_id,
          CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
               ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END AS words
          FROM $table),
        stats AS (SELECT count(*) * 1.0 AS n_docs, avg(len(words) * 1.0) AS avgdl,
                  $dfSelects FROM w),
        scored AS ($perQuery),
        ranked AS (SELECT query_id, doc_id, score,
                   row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
                   FROM scored WHERE score > 0)
        SELECT query_id, CAST(rnk AS BIGINT) AS rnk, doc_id, round(score, 4) AS score
        FROM ranked WHERE rnk <= $k"""
  }
}
