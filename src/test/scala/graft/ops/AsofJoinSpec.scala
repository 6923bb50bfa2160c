package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Gates for the backward as-of join: exact agreement with a brute-force
  * per-row reference, the inclusive tie bound, the deterministic duplicate
  * collapse, null-on-no-match, multi-key joins, and partitioning
  * independence (the union+window formulation must not depend on physical
  * row order). */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Brute force: latest right (ts, payload) with rightTs <= leftTs. */
  private def reference(left: Seq[(Long, Long)], right: Seq[(Long, Long, String)])
      : Map[(Long, Long), Option[(Long, String)]] =
    left.map { case (k, ts) =>
      val m = right.filter(r => r._1 == k && r._2 <= ts)
      (k, ts) -> (if (m.isEmpty) None
                  else {
                    val best = m.map(_._2).max
                    // collapse rule: max payload wins among equal (key, ts)
                    Some((best, m.filter(_._2 == best).map(_._3).max))
                  })
    }.toMap

  private def run(left: Seq[(Long, Long)], right: Seq[(Long, Long, String)])
      : Map[(Long, Long), Option[(Long, String)]] =
    AsofJoin.backward(
        left.toDF("k", "ts"), right.toDF("k", "ts", "v"), Seq("k"), "ts")
      .select("k", "ts", "asof_ts", "asof_v")
      .as[(Long, Long, Option[Long], Option[String])].collect()
      .map { case (k, ts, rts, v) => (k, ts) -> rts.map(t => (t, v.get)) }.toMap

  private val right = Seq(
    (1L, 10L, "r10"), (1L, 20L, "r20"), (1L, 30L, "r30"),
    (2L, 100L, "s100"))
  private val left = Seq(
    (1L, 5L),   // before any right row -> null
    (1L, 10L),  // exact tie -> inclusive
    (1L, 25L),  // between -> r20
    (1L, 99L),  // after all -> r30
    (2L, 100L), (2L, 101L),
    (3L, 50L))  // key with no right rows -> null

  test("matches the brute-force reference, ties inclusive, nulls on no match") {
    val got = run(left, right)
    assert(got === reference(left, right))
    assert(got((1L, 5L)) === None)
    assert(got((1L, 10L)) === Some((10L, "r10")))   // inclusive bound
    assert(got((3L, 50L)) === None)
  }

  test("duplicate right rows on (key, ts) collapse deterministically to max") {
    val dup = right ++ Seq((1L, 20L, "zz20"), (1L, 20L, "aa20"))
    val got = run(Seq((1L, 25L)), dup)
    assert(got((1L, 25L)) === Some((20L, "zz20"))) // max payload wins
    assert(got === reference(Seq((1L, 25L)), dup))
  }

  test("multi-key join scopes matches to the full key") {
    val l = Seq((1L, "a", 50L), (1L, "b", 50L)).toDF("k1", "k2", "ts")
    val r = Seq((1L, "a", 40L, 7L)).toDF("k1", "k2", "ts", "v")
    val got = AsofJoin.backward(l, r, Seq("k1", "k2"), "ts")
      .select("k2", "asof_v").as[(String, Option[Long])].collect().toMap
    assert(got === Map("a" -> Some(7L), "b" -> None))
  }

  test("left payload columns pass through unchanged") {
    val l = Seq((1L, 25L, "payload")).toDF("k", "ts", "note")
    val got = AsofJoin.backward(l, right.toDF("k", "ts", "v"), Seq("k"), "ts")
      .select("note", "asof_v").as[(String, String)].collect()
    assert(got === Array(("payload", "r20")))
  }

  test("results are identical across input partitioning") {
    val a = run(left, right)
    val b = AsofJoin.backward(
        left.toDF("k", "ts").repartition(7),
        right.toDF("k", "ts", "v").repartition(3), Seq("k"), "ts")
      .select("k", "ts", "asof_ts", "asof_v")
      .as[(Long, Long, Option[Long], Option[String])].collect()
      .map { case (k, ts, rts, v) => (k, ts) -> rts.map(t => (t, v.get)) }.toMap
    assert(a === b)
  }

  test("plan shape: exactly one exchange (the window's key partitioning)") {
    val df = AsofJoin.backward(
      left.toDF("k", "ts"), right.toDF("k", "ts", "v"), Seq("k"), "ts")
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected <=2 exchanges (dup-collapse + window), got:\n$plan")
  }
}
