package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkTestBase

/** Top-k-per-key custom operator: the explicit API and the optimizer-rule
  * rewrite must both reproduce the window row_number formulation exactly
  * (values AND ranks), plan with the bounded-heap physical operators, and
  * prune map-side before the exchange. */
class TopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  private def windowTop3 = {
    val w = Window.partitionBy($"o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    orders.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  test("TopK.perKey == window row_number formulation, ranks included") {
    val topk = TopK.perKey(orders, Seq($"o_custkey"),
        Seq(desc("o_totalprice"), asc("o_orderkey")), k = 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    assert(asSet(topk) === asSet(windowTop3))
    // physical plan uses the custom operators with one exchange between them
    // (string checks: AQE wraps the tree, so node-type collect misses them)
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPartial") && plan.contains("TopKFinal"), plan)
    assert(plan.contains("Exchange hashpartitioning(o_custkey"), plan)
  }

  test("optimizer rule rewrites Filter(rn<=k, Window(row_number)) transparently") {
    val prevOpt = spark.experimental.extraOptimizations
    val prevStrat = spark.experimental.extraStrategies
    spark.experimental.extraOptimizations = prevOpt :+ RewriteRowNumberTopK
    spark.experimental.extraStrategies = prevStrat :+ TopKStrategy
    try {
      val df = windowTop3 // plain window code — no graft API in sight
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKFinal"), s"rule did not fire:\n$plan")
      assert(!plan.contains(" Window "), plan)
      assert(asSet(df) === asSet(windowTop3)) // second eval without the rule? both rewritten — compare to explicit API instead
      val viaApi = TopK.perKey(orders, Seq($"o_custkey"),
          Seq(desc("o_totalprice"), asc("o_orderkey")), k = 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      assert(asSet(df) === asSet(viaApi))
    } finally {
      spark.experimental.extraOptimizations = prevOpt
      spark.experimental.extraStrategies = prevStrat
    }
    // with the rule removed the window result must match what the rewrite gave
    assert(asSet(windowTop3).nonEmpty)
  }

  test("map-side pruning: partial output is bounded by keys x k per partition") {
    // one hot key with 1000 rows across partitions + k=2
    val df = (1 to 1000).map(i => (1L, i.toLong)).toDF("key", "v").repartition(4)
    val top = TopK.perKey(df, Seq($"key"), Seq(asc("v")), k = 2)
    val rows = top.collect().map(r => (r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(rows === Seq((1L, 1), (2L, 2)))
    // ties/duplicate order values: deterministic given a total order column
    val dup = Seq((1L, 5L, "a"), (1L, 5L, "b"), (1L, 5L, "c")).toDF("key", "v", "t")
    val got = TopK.perKey(dup, Seq($"key"), Seq(asc("v"), asc("t")), k = 2)
      .select("t", "rn").collect().map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
    assert(got === Seq(("a", 1), ("b", 2)))
  }

  test("empty input and k larger than group size") {
    val empty = Seq.empty[(Long, Long)].toDF("key", "v")
    assert(TopK.perKey(empty, Seq($"key"), Seq(asc("v")), 3).count() === 0)
    val small = Seq((1L, 10L), (1L, 20L)).toDF("key", "v")
    val rows = TopK.perKey(small, Seq($"key"), Seq(asc("v")), 5)
      .select("v", "rn").collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(rows === Seq((10L, 1), (20L, 2)))
  }

  test("GLOBAL top-k (empty keys) gathers across partitions, not per partition") {
    // regression: UnspecifiedDistribution let every partition emit its own
    // top-k; AllTuples forces the single-reducer gather
    val df = (1 to 1000).map(_.toLong).toDF("v").repartition(6)
    val rows = TopK.perKey(df, Seq.empty, Seq(asc("v")), k = 4)
      .select("v", "rn").collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(rows === Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4)))
    // and the transparent rewrite path for a global window
    val prevOpt = spark.experimental.extraOptimizations
    val prevStrat = spark.experimental.extraStrategies
    spark.experimental.extraOptimizations = prevOpt :+ RewriteRowNumberTopK
    spark.experimental.extraStrategies = prevStrat :+ TopKStrategy
    try {
      val w = Window.orderBy(asc("v"))
      val g = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 4)
      assert(g.queryExecution.executedPlan.toString.contains("TopKFinal"))
      assert(g.select("v", "rn").collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
        === rows)
    } finally {
      spark.experimental.extraOptimizations = prevOpt
      spark.experimental.extraStrategies = prevStrat
    }
  }

  test("ambiguous column names are rejected, not silently picked") {
    val a = Seq((1L, 2.0)).toDF("key", "cos")
    val b = Seq((1L, 3.0)).toDF("k2", "cos")
    val joined = a.join(b, a("key") === b("k2"))
    intercept[IllegalArgumentException] {
      TopK.perKey(joined, Seq(col("key")), Seq(desc("cos")), 1).collect()
    }
  }

  test("partial flush budget: bounded memory, no lost survivors") {
    import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, SortOrder, Ascending, BoundReference}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.LongType
    val attrs = Seq(
      org.apache.spark.sql.catalyst.expressions.AttributeReference("key", LongType, nullable = false)(),
      org.apache.spark.sql.catalyst.expressions.AttributeReference("v", LongType, nullable = false)())
    val keyProj = UnsafeProjection.create(Seq(attrs.head), attrs)
    val ord = GenerateOrdering.generate(Seq(SortOrder(attrs(1), Ascending)), attrs)
    // one REUSED row object, like Spark's iterators hand out
    val reused = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    val data = (1 to 500).map(i => ((i % 7).toLong, (1000 - i).toLong))
    def rows: Iterator[InternalRow] = data.iterator.map { case (k, v) =>
      reused.update(0, k); reused.update(1, v); reused
    }
    // tiny budget forces many flushes; survivors must still include every
    // key's true top-2 (extra emitted rows are fine — the final prunes)
    val pruned = TopKHeaps.prunedIterator(rows, keyProj, ord, 2, budget = 16)
      .map(r => (r.getLong(0), r.getLong(1))).toVector
    val expected = data.groupBy(_._1).values.flatMap(_.map(_._2).sorted.take(2)).toSet
    val prunedByKey = pruned.groupBy(_._1).view.mapValues(_.map(_._2).sorted.take(2)).toMap
    data.groupBy(_._1).foreach { case (k, vs) =>
      assert(prunedByKey(k) === vs.map(_._2).sorted.take(2).toVector, s"key $k")
    }
    assert(expected.subsetOf(pruned.map(_._2).toSet))
  }

  test("rewrite rule does not fire for huge limits (keeps the window plan)") {
    val prevOpt = spark.experimental.extraOptimizations
    val prevStrat = spark.experimental.extraStrategies
    spark.experimental.extraOptimizations = prevOpt :+ RewriteRowNumberTopK
    spark.experimental.extraStrategies = prevStrat :+ TopKStrategy
    try {
      val w = Window.partitionBy($"o_custkey").orderBy(desc("o_totalprice"))
      val big = orders.withColumn("rn", row_number().over(w))
        .filter($"rn" <= 2147483647) // degenerate guard — must not change plans
      assert(!big.queryExecution.executedPlan.toString.contains("TopKFinal"))
    } finally {
      spark.experimental.extraOptimizations = prevOpt
      spark.experimental.extraStrategies = prevStrat
    }
  }
}
