package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, Window => LWindow, Filter => LFilter}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Top-k-per-key as a first-class operator — the full custom-operator stack
  * (logical node + optimizer rule + planner strategy + physical operators,
  * registered through `SparkSessionExtensions`).
  *
  * WHY: the idiomatic Spark spelling —
  * `row_number().over(partitionBy(K).orderBy(O)) ≤ k` — plans as a
  * hash-exchange of EVERY row followed by a FULL SORT of every key's rows,
  * then discards all but k per key. At web scale (rank-k per user/query/
  * domain over 10¹² rows) the dominant costs are exactly the two things the
  * window formulation cannot avoid: shuffling rows that cannot possibly
  * survive, and sorting whole partitions for their top handful. This
  * operator keeps a bounded heap of k rows per key BEFORE the exchange
  * (map-side pruning, the aggregation analogue of a partial combine), ships
  * only survivors, and merges heaps on the reduce side — O(n log k) compute,
  * shuffle volume ≤ keys × k rows.
  *
  * Memory: each task holds ≤ (distinct keys in its partition) × k rows — the
  * same envelope as a partial hash aggregate with a k-row buffer.
  *
  * Two surfaces:
  *  - [[TopK.perKey]]: explicit Column-API constructor.
  *  - [[RewriteRowNumberTopK]]: optimizer rule that rewrites the canonical
  *    `Filter(rn ≤ k, Window(row_number))` plan — enabled with the rest of
  *    the graft extensions (`spark.sql.extensions=graft.plans.GraftExtensions`),
  *    so EXISTING window queries get the operator without a code change.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          rnAttr: Attribute, child: LogicalPlan) extends UnaryNode {
  require(k >= 1)
  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopK {
  /** Explicit API: top `k` rows per `keys` group under `order`, with a
    * 1-based `rn` rank column appended (name `rnName`). */
  def perKey(df: org.apache.spark.sql.DataFrame, keys: Seq[org.apache.spark.sql.Column],
             order: Seq[org.apache.spark.sql.Column], k: Int,
             rnName: String = "rn"): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    // self-contained without the session extensions: the planner needs the
    // strategy to turn the logical node physical. Synchronized check-then-act
    // — experimental.extraStrategies is shared session state and a race
    // would drop a concurrently-registered strategy.
    TopK.synchronized {
      if (!spark.experimental.extraStrategies.contains(TopKStrategy))
        spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    }
    val plan = df.queryExecution.analyzed
    val keyExprs = keys.map(c => org.apache.spark.sql.GraftColumnBridge.catalystExpression(c))
    val orderExprs = order.map { c =>
      org.apache.spark.sql.GraftColumnBridge.catalystExpression(c) match {
        case so: SortOrder => so
        case e => SortOrder(e, Ascending)
      }
    }
    val rnAttr = AttributeReference(rnName, IntegerType, nullable = false)()
    val resolved = TopKPerKeyNode(
      keyExprs.map(resolveAgainst(_, plan)), orderExprs.map(so =>
        so.copy(child = resolveAgainst(so.child, plan))), k, rnAttr, plan)
    org.apache.spark.sql.GraftColumnBridge.ofRows(spark, resolved)
  }

  private def sameName(a: String, b: String): Boolean =
    if (org.apache.spark.sql.internal.SQLConf.get.caseSensitiveAnalysis) a == b
    else a.equalsIgnoreCase(b)

  private def resolveAgainst(e: Expression, plan: LogicalPlan): Expression = e.transform {
    case u: UnresolvedAttribute =>
      plan.output.filter(a => sameName(u.nameParts.last, a.name)) match {
        case Seq(one) => one
        case Seq() =>
          throw new IllegalArgumentException(s"column ${u.name} not in ${plan.output}")
        case many => // mirror the ambiguity error the Window API would raise
          throw new IllegalArgumentException(
            s"column ${u.name} is ambiguous: matches ${many.mkString(", ")}")
      }
    case a: AttributeReference =>
      plan.output.find(_.exprId == a.exprId)
        .orElse(plan.output.filter(o => sameName(o.name, a.name)) match {
          case Seq(one) => Some(one)
          case Seq() => None
          case many => throw new IllegalArgumentException(
            s"column ${a.name} is ambiguous: matches ${many.mkString(", ")}")
        })
        .getOrElse(a)
  }
}

/** Optimizer rule: `Filter(rn ≤ k, Window(Seq(rn ← row_number over (P, O))))`
  * → [[TopKPerKeyNode]]. Matches only the exact canonical shape (single
  * row_number window expression, standard frame, a bare `rn ≤ lit` / `rn <
  * lit` predicate) AND small k — anything else keeps the stock window plan:
  * for large k the bounded-heap operator's keys×k memory beats nobody, and
  * a degenerate `rn <= Int.MaxValue` guard must not change plans. */
object RewriteRowNumberTopK extends Rule[LogicalPlan] {
  /** Largest limit the rewrite fires for; larger ranks keep WindowExec. */
  val MaxRewriteK = 10000

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ LFilter(cond, w: LWindow) if w.windowExpressions.length == 1 =>
      (w.windowExpressions.head match {
        case a @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _) =>
          extractLimit(cond, a.toAttribute).map { k =>
            TopKPerKeyNode(w.partitionSpec, w.orderSpec, k, a.toAttribute, w.child)
          }
        case _ => None
      }).getOrElse(f)
  }

  private def extractLimit(cond: Expression, rn: Attribute): Option[Int] = (cond match {
    case LessThanOrEqual(r: Attribute, Literal(v: Int, IntegerType)) if r.semanticEquals(rn) && v >= 1 =>
      Some(v)
    case LessThan(r: Attribute, Literal(v: Int, IntegerType)) if r.semanticEquals(rn) && v >= 2 =>
      Some(v - 1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), r: Attribute) if r.semanticEquals(rn) && v >= 1 =>
      Some(v)
    case _ => None
  }).filter(_ <= MaxRewriteK)
}

/** Planner strategy: partial (pre-exchange) + final (post-exchange) heaps. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rn, child) =>
      TopKFinalExec(keys, order, k, rn,
        TopKPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

private[plans] object TopKHeaps {
  /** Rows buffered per task before the PARTIAL operator flushes its heaps
    * downstream and starts fresh. Flushing is always CORRECT for the partial
    * pass (it only prunes; emitting extra rows never loses a survivor) and
    * bounds memory on high-cardinality keys — where a plain hash-of-heaps
    * would retain ~every row of the partition on-heap, unlike the spilling
    * window sort this operator replaces. */
  val PartialFlushRows: Int = 1 << 18

  /** key → bounded heap (worst row at head); rows are defensively copied.
    * `maxBuffered` < 0 means unbounded (the FINAL operator, which needs each
    * key complete); ≥ 0 stops after that many rows are retained so the
    * caller can drain and restart. */
  def accumulate(it: Iterator[InternalRow], keyProj: UnsafeProjection,
                 ord: Ordering[InternalRow], k: Int, maxBuffered: Long = -1L)
      : java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]] = {
    val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    val cmp = ord.reverse // max-heap under the sort order: head = worst kept
    var buffered = 0L
    while (it.hasNext && (maxBuffered < 0 || buffered < maxBuffered)) {
      val row = it.next()
      val key = keyProj(row)
      var q = heaps.get(key)
      if (q == null) {
        // initial capacity capped: k can be huge (the transparent rewrite
        // path sees arbitrary user limits) and PriorityQueue allocates its
        // array eagerly; it grows on demand anyway
        q = new java.util.PriorityQueue[InternalRow](math.min(k + 1, 16), cmp)
        heaps.put(key.copy(), q)
        buffered += 1
      }
      if (q.size < k) { q.add(row.copy()); buffered += 1 }
      else if (ord.compare(row, q.peek()) < 0) {
        q.poll()
        q.add(row.copy())
      }
    }
    heaps
  }

  /** Streaming map-side pruning with the flush budget applied
    * (`budget` parameterized for tests). */
  def prunedIterator(it: Iterator[InternalRow], keyProj: UnsafeProjection,
                     ord: Ordering[InternalRow], k: Int,
                     budget: Long = PartialFlushRows): Iterator[InternalRow] =
    new Iterator[InternalRow] {
      import scala.jdk.CollectionConverters._
      private var out: Iterator[InternalRow] = Iterator.empty
      private def refill(): Unit =
        while (!out.hasNext && it.hasNext) {
          out = accumulate(it, keyProj, ord, k, budget)
            .values().iterator().asScala.flatMap(_.iterator().asScala)
        }
      override def hasNext: Boolean = { refill(); out.hasNext }
      override def next(): InternalRow = { refill(); out.next() }
    }
}

/** Map-side pruning: emits each partition's ≤ k rows per key, unranked. */
case class TopKPartialExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                           child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val (ks, os, kk) = (keys, order, k)
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(ks, childOutput)
      val ord = GenerateOrdering.generate(os, childOutput)
      // flush-bounded accumulate: heaps drain downstream and restart
      // whenever the BUFFERED (copied) row count hits the budget, keeping
      // memory bounded on high-cardinality keys at the cost of some lost
      // pruning (the final operator reconciles). NOTE: this must stream off
      // the raw iterator directly — Spark reuses the InternalRow object, so
      // anything like it.grouped(n) would buffer n references to ONE
      // mutating row (a bug ScalaCheck caught in PropertySpec).
      TopKHeaps.prunedIterator(it, keyProj, ord, kk)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPartialExec =
    copy(child = newChild)
}

/** Reduce side: complete heaps per key, rank ascending, append rn. */
case class TopKFinalExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                         rnAttr: Attribute, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    // empty keys = GLOBAL top-k: every partial survivor must land on ONE
    // reducer (AllTuples) — anything weaker would emit a top-k per partition
    if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val (ks, os, kk) = (keys, order, k)
    val outAttrs = output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(ks, childOutput)
      val ord = GenerateOrdering.generate(os, childOutput)
      val heaps = TopKHeaps.accumulate(it, keyProj, ord, kk)
      val proj = UnsafeProjection.create(outAttrs.map(_.dataType).toArray)
      val rnRow = new GenericInternalRow(1)
      val joined = new JoinedRow()
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { q =>
        val arr = q.iterator().asScala.toArray.sorted(ord)
        arr.iterator.zipWithIndex.map { case (row, i) =>
          rnRow.setInt(0, i + 1)
          proj(joined(row, rnRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKFinalExec =
    copy(child = newChild)
}
