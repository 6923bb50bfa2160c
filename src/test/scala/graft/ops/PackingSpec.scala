package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Gates for the round-4 mixture-layout operators: token-budget sequence
  * packing (two-level distributed prefix sum) and per-domain quota capping
  * (bounded-heap top-k). Each is checked against a driver-side brute-force
  * reference, plus the partitioning-determinism invariant every engine op
  * must hold. */
class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "one two three"),            // 3 tokens, offset 0
    (1L, ""),                         // empty: 0 tokens at offset 3
    (2L, "a b c d e"),                // 5 tokens, offset 3 → crosses the 4-boundary
    (5L, "w x"),                      // gap in ids is fine; offset 8
    (7L, "p q r s t u v"),            // 7 tokens, offset 10
    (9L, "tail")                      // offset 17
  ).toDF("doc_id", "text")

  test("packOffsets matches a driver-side global cumsum at budget 4") {
    val got = Packing.packOffsets(docs, budget = 4, groupSize = 2)
      .orderBy("doc_id").collect()
    // driver-side reference: exact concat-and-chunk layout
    val ref = Seq(
      (0L, 3L, 0L, 0L, 0L, 1L),
      (1L, 0L, 3L, 0L, 0L, 1L),   // empty doc sits at the boundary of seq 0
      (2L, 5L, 3L, 0L, 1L, 2L),   // spans seqs 0..1
      (5L, 2L, 8L, 2L, 2L, 1L),
      (7L, 7L, 10L, 2L, 4L, 3L),  // spans seqs 2..4
      (9L, 1L, 17L, 4L, 4L, 1L))
    assert(got.length === ref.length)
    got.zip(ref).foreach { case (row, (id, n, off, s0, s1, ns)) =>
      assert(row.getLong(0) === id)
      assert(row.getAs[Long]("n_tokens") === n, s"n_tokens of $id")
      assert(row.getAs[Long]("tok_offset") === off, s"tok_offset of $id")
      assert(row.getAs[Long]("seq_start") === s0, s"seq_start of $id")
      assert(row.getAs[Long]("seq_end") === s1, s"seq_end of $id")
      assert(row.getAs[Long]("n_seqs") === ns, s"n_seqs of $id")
    }
  }

  test("packOffsets is invariant to input partitioning and group size") {
    val base = Packing.packOffsets(docs, budget = 4, groupSize = 2)
      .orderBy("doc_id").collect().toSeq
    for (parts <- Seq(1, 7); gs <- Seq(1, 3, 1000)) {
      val alt = Packing.packOffsets(docs.repartition(parts), budget = 4, groupSize = gs)
        .orderBy("doc_id").collect().toSeq
      assert(alt === base, s"parts=$parts groupSize=$gs")
    }
  }

  test("packOffsets conserves tokens: offsets are the exclusive cumsum") {
    val rows = Packing.packOffsets(docs, budget = 1024, groupSize = 3)
      .orderBy("doc_id").collect()
    var acc = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("tok_offset") === acc)
      acc += r.getAs[Long]("n_tokens")
    }
  }

  test("domainQuota equals a window row_number reference and respects the cap") {
    val d = (0L until 60L).map { i =>
      // three domains, quality varies with doc length
      val dom = s"d${i % 3}"
      val text = Seq.fill((i % 7 + 1).toInt * 4)("the word list and").mkString(" ")
      (i, dom, text)
    }.toDF("doc_id", "source", "text")
    val got = Sampling.domainQuota(d, cap = 5)
      .orderBy("source", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val ref = d.select(col("source"), col("doc_id"),
        round(TextStats.qualityScore(col("text")), 2).as("quality"))
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(desc("quality"), asc("doc_id"))).cast("long"))
      .filter(col("rn") <= 5)
      .select("source", "rn", "doc_id", "quality")
      .orderBy("source", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === ref.toSeq)
    assert(got.groupBy(_._1).forall(_._2.length <= 5))
    // determinism across partitionings
    val alt = Sampling.domainQuota(d.repartition(13), cap = 5)
      .orderBy("source", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(alt.toSeq === got.toSeq)
  }
}
