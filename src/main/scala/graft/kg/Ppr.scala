package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Personalized PageRank — seed-relative node relevance over the link graph.
  * Where [[PageRank]] answers "how important is this page globally", PPR
  * answers "how relevant is it TO THESE SEEDS": the restart mass returns to
  * the seed set instead of spreading uniformly, so rank decays with distance
  * from the seeds. That is the crawl-prioritization primitive (TrustRank /
  * focused-crawl frontier scoring from a trusted seed list) and the KG's
  * seed-relative entity-relevance ranking — the weighted companion of the
  * [[Bfs]] hop budget.
  *
  * Determinism: identical fixed-point discipline to [[PageRank]] — ranks are
  * Longs in micro-units of [[PageRank.Scale]], damping is the rational
  * 85/100, contributions use integer floor division. Long sums are exact and
  * associative, so results are bit-identical at any parallelism, and the
  * DuckDB oracle unrolls the same iterations bit-exactly
  * ([[oracleSqlFromEdges]]).
  *
  * Scale: everything PageRank does (edges hash-partitioned by src ONCE and
  * localCheckpoint'ed, one slim (node, rank) shuffle per round, per-round
  * lineage truncation) PLUS the PPR-specific win: non-seed nodes start at
  * exactly 0 and the contribution join filters `rank_fp > 0`, so round r
  * shuffles only the out-edges of nodes the seed mass has actually reached —
  * early rounds are frontier-sized, not |V|-sized (exact: a zero rank
  * floor-divides to a zero contribution, so skipping it changes no sum).
  */
object Ppr {

  /** Seed-personalized ranks for the directed graph. `seedPred` selects the
    * seeds from the graph's node set (evaluated on a column named `node`).
    * Output: (node, rank_fp bigint, rank double) for EVERY node — unreached
    * nodes report exactly 0. */
  def run(edges: DataFrame, seedPred: Column, iterations: Int = 10,
          srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
      .repartition(col("src"))
      .localCheckpoint() // lineage truncation — the iterative-job invariant
    // small-graph early-out: the seed predicate is evaluated by Catalyst
    // over a LocalRelation of the node set (identical expression
    // semantics), then the fixpoint runs driver-local (bit-exact,
    // LocalIterParitySpec)
    val eCnt = e.count()
    if (eCnt > 0 && eCnt <= LocalIter.maxEdges(e.sparkSession)) {
      val localEdges = e.collect().map(r => (r.get(0), r.get(1)))
      val nodeType = e.schema.fields(0).dataType
      val seedSet = LocalIter.evalSeeds(e.sparkSession, nodeType,
        LocalIter.nodeSet(localEdges), seedPred)
      return LocalIter.ppr(e.sparkSession, nodeType, localEdges, seedSet, iterations)
    }
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val eDeg = e.join(outDeg, "src").localCheckpoint()
    val nodes = e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
      .distinct()
    // the seed flag rides the node table so the per-round restart term is a
    // column product, never a re-evaluation of the predicate
    val seeded = nodes.withColumn("is_seed", when(seedPred, 1L).otherwise(0L))
      .localCheckpoint()
    val nSeeds = seeded.filter(col("is_seed") === 1L).count()
    require(nSeeds > 0, "personalized PageRank needs at least one seed node")
    val init = PageRank.Scale / nSeeds
    val base = init * 15L / 100L

    var ranks = seeded
      .select(col("node"), col("is_seed"), (col("is_seed") * init).as("rank_fp"))
      .localCheckpoint()
    var i = 0
    while (i < iterations) {
      val contribs = eDeg
        .join(ranks.filter(col("rank_fp") > 0L), eDeg("src") === col("node"))
        .select(col("dst").as("node"),
          expr("rank_fp * 85L div (100L * deg)").as("c")) // exact Long floor
        .groupBy("node").agg(sum(col("c")).as("inflow"))
      ranks = seeded.join(contribs, Seq("node"), "left_outer")
        .select(col("node"), col("is_seed"),
          (col("is_seed") * base + coalesce(col("inflow"), lit(0L))).as("rank_fp"))
        .localCheckpoint()
      i += 1
    }
    ranks.select(col("node"), col("rank_fp"),
      (col("rank_fp").cast("double") / lit(PageRank.Scale.toDouble)).as("rank"))
  }

  /** The unrolled fixed-point PPR oracle (the q54/q66 PageRank pattern):
    * each round is one contribution aggregation + one left join against the
    * flagged node table, referencing its predecessor exactly once — the
    * linear-inlining shape DuckDB needs. `seedWhere` must be the predicate
    * `run` was given, phrased over a column named `node`; `//` is DuckDB's
    * integer floor division (positive operands ⇒ same as JVM `div`). */
  def oracleSqlFromEdges(edgeSql: String, seedWhere: String,
                         iterations: Int = 10): String = {
    val s = PageRank.Scale
    val iters = (1 to iterations).map { k =>
      s"""c$k AS (SELECT e.dst AS node,
                 CAST(sum(r.rank_fp * 85 // (100 * e.deg)) AS BIGINT) AS inflow
                 FROM e JOIN r${k - 1} r ON r.node = e.src AND r.rank_fp > 0
                 GROUP BY e.dst),
          r$k AS (SELECT n.node, n.is_seed,
                 n.is_seed * (SELECT base FROM params) + coalesce(c.inflow, 0) AS rank_fp
                 FROM seeded n LEFT JOIN c$k c ON c.node = n.node)"""
    }.mkString(",\n          ")
    s"""WITH e0 AS ($edgeSql),
          deg AS (SELECT src, count(*) AS deg FROM e0 GROUP BY src),
          e AS (SELECT e0.src, e0.dst, d.deg FROM e0 JOIN deg d ON d.src = e0.src),
          nodes AS (SELECT src AS node FROM e0 UNION SELECT dst FROM e0),
          seeded AS (SELECT node, CASE WHEN $seedWhere THEN CAST(1 AS BIGINT)
                                       ELSE CAST(0 AS BIGINT) END AS is_seed
                     FROM nodes),
          params AS (SELECT $s // sum(is_seed) AS init,
                     ($s // sum(is_seed)) * 15 // 100 AS base FROM seeded),
          r0 AS (SELECT node, is_seed,
                 is_seed * (SELECT init FROM params) AS rank_fp FROM seeded),
          $iters
       SELECT node, CAST(rank_fp AS BIGINT) AS rank_fp,
              CAST(rank_fp AS DOUBLE) / $s.0 AS rank
       FROM r$iterations"""
  }
}
