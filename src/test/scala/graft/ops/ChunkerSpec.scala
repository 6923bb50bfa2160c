package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Gates for the strided chunker: exact agreement with a driver-side
  * reference (boundaries, counts, and chunk CONTENT via md5), overlap
  * continuity, tail rules, short/empty docs, and partitioning independence. */
class ChunkerSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def reference(docs: Seq[(Long, String)], w: Int, s: Int, minTail: Int)
      : Set[(Long, Long, Long, Long, String)] =
    docs.flatMap { case (id, text) =>
      val t = text.trim.toLowerCase.split("\\s+").toSeq
      if (t == Seq("")) Seq.empty
      else (0 until t.size by s).zipWithIndex.collect {
        case (start, idx) if idx == 0 || t.size - start >= minTail =>
          val chunk = t.slice(start, start + w)
          (id, idx.toLong, start.toLong, chunk.size.toLong, md5hex(chunk.mkString(" ")))
      }
    }.toSet

  private def run(docs: Seq[(Long, String)], w: Int, s: Int, minTail: Int)
      : Set[(Long, Long, Long, Long, String)] =
    Chunker.chunk(docs.toDF("doc_id", "text"), w, s, minTail)
      .as[(Long, Long, Long, Long, String)].collect().toSet

  private val docs = Seq(
    1L -> "a b c d e f g h i j k l m",    // 13 tokens
    2L -> "one two three",                // shorter than the window
    3L -> "  x   Y\tz  ",                 // messy whitespace + case
    4L -> " ",                            // whitespace-only -> nothing
    5L -> (1 to 40).map(i => s"t$i").mkString(" "))

  test("matches the reference on boundaries, counts, and content") {
    for ((w, s, mt) <- Seq((5, 3, 2), (5, 5, 1), (8, 4, 4), (50, 10, 5)))
      assert(run(docs, w, s, mt) === reference(docs, w, s, mt), s"(w=$w s=$s mt=$mt)")
  }

  test("overlap continuity: consecutive chunks share window-stride tokens") {
    val got = run(Seq(5L -> docs(4)._2), 8, 5, 4).toSeq.sortBy(_._2)
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 - a._3 === 5L) // starts advance by exactly the stride
      assert(a._3 + 8 > b._3, "chunks must overlap")
    case _ => ()
    }
  }

  test("a doc shorter than the window yields exactly its whole self") {
    val got = run(Seq(2L -> "one two three"), 10, 8, 5)
    assert(got === Set((2L, 0L, 0L, 3L, md5hex("one two three"))))
  }

  test("short tails are dropped; a qualifying tail is kept") {
    // 13 tokens, w=5 s=4: starts 0,4,8,12 -> tail at 12 has 1 token < minTail=3
    val got = run(Seq(1L -> docs(0)._2), 5, 4, 3)
    assert(got.map(_._3) === Set(0L, 4L, 8L))
    // minTail=1 keeps it
    assert(run(Seq(1L -> docs(0)._2), 5, 4, 1).map(_._3) === Set(0L, 4L, 8L, 12L))
  }

  test("degenerate parameters are rejected") {
    intercept[IllegalArgumentException](Chunker.chunk(docs.toDF("doc_id", "text"), 5, 6, 1))
    intercept[IllegalArgumentException](Chunker.chunk(docs.toDF("doc_id", "text"), 5, 5, 6))
  }

  test("results are identical across input partitioning") {
    val a = run(docs, 5, 3, 2)
    val b = Chunker.chunk(docs.toDF("doc_id", "text").repartition(7), 5, 3, 2)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(a === b)
  }

  test("streaming chunking equals batch exactly (stateless scan-side operator)") {
    val dir = java.nio.file.Files.createTempDirectory("chunk_stream").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(docs.toDF("doc_id", "text").schema)
      .parquet(dir)
    val q = Chunker.chunk(stream, 5, 3, 2)
      .writeStream.outputMode("append").format("memory")
      .queryName("chunk_stream").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT * FROM chunk_stream")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(got === run(docs, 5, 3, 2))
  }
}
