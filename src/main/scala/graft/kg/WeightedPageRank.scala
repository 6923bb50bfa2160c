package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank — link-multiplicity-aware importance over rollup graphs
  * (the host graph's `n_links`, anchor-frequency edges, triple counts).
  * [[PageRank]] treats every edge equally; here a host that links another
  * host 10,000 times passes proportionally more mass than a single stray
  * link.
  *
  * Determinism + overflow design: the naive fixed-point contribution
  * `rank·85·w div (100·W_src)` overflows a Long once `w > ~10^5` at the
  * rank scale, so weights are pre-normalized per source into 2^20
  * fixed-point fractions `frac = w·2^20 div W_src` (≤ 2^20) and each round
  * contributes `(rank·85 div 100)·frac div 2^20` — max intermediate
  * ~8.9·10^17, exact Long arithmetic at ANY weight magnitude. The per-edge
  * quantization to 2^-20 of the source's mass is a deterministic loss, the
  * same contract as the unweighted operator's integer-division evaporation,
  * and the DuckDB oracle unrolls the identical expression bit-exactly.
  *
  * Scale: identical to [[PageRank]] — weighted edges collapse once
  * (duplicate (src,dst) sum their weights), partition by src once,
  * localCheckpoint; each round shuffles only the slim (node, rank) table.
  */
object WeightedPageRank {

  val FracScale = 1L << 20

  /** Ranks for the weighted directed graph. Output: (node, rank_fp bigint,
    * rank double). Duplicate (src, dst) edges collapse by summing `wCol`;
    * non-positive weights are rejected. */
  def run(edges: DataFrame, iterations: Int = 10, srcCol: String = "src",
          dstCol: String = "dst", wCol: String = "w"): DataFrame = {
    val spark = edges.sparkSession
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).cast("long").as("w"))
      .groupBy("src", "dst").agg(sum(col("w")).as("w"))
      .repartition(col("src"))
      .localCheckpoint()
    // small-graph early-out (bit-exact driver-local loop incl. the
    // positive-weight requirement, LocalIterParitySpec)
    val eCnt = e0.count()
    if (eCnt > 0 && eCnt <= LocalIter.maxEdges(spark))
      return LocalIter.weightedPageRank(spark, e0.schema.fields(0).dataType,
        e0.collect().map(r => (r.get(0), r.get(1), r.getLong(2))), iterations)
    require(e0.filter(col("w") <= 0L).isEmpty, "edge weights must be positive")
    val wOut = e0.groupBy("src").agg(sum(col("w")).as("w_src"))
    val eFrac = e0.join(wOut, "src")
      .select(col("src"), col("dst"),
        expr(s"w * ${FracScale}L div w_src").as("frac"))
      .localCheckpoint()
    val nodes = e0.select(col("src").as("node")).union(e0.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    if (n == 0)
      return nodes.select(col("node"), lit(0L).as("rank_fp"), lit(0.0).as("rank"))
    val init = PageRank.Scale / n
    val base = init * 15L / 100L

    var ranks = nodes.select(col("node"), lit(init).as("rank_fp")).localCheckpoint()
    var i = 0
    while (i < iterations) {
      val contribs = eFrac.join(ranks, eFrac("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr(s"(rank_fp * 85L div 100L) * frac div ${FracScale}L").as("c"))
        .groupBy("node").agg(sum(col("c")).as("inflow"))
      ranks = nodes.join(contribs, Seq("node"), "left_outer")
        .select(col("node"), (lit(base) + coalesce(col("inflow"), lit(0L))).as("rank_fp"))
        .localCheckpoint()
      i += 1
    }
    ranks.select(col("node"), col("rank_fp"),
      (col("rank_fp").cast("double") / lit(PageRank.Scale.toDouble)).as("rank"))
  }

  /** Unrolled fixed-point oracle (the q54/q83 pattern); `edgeSql` must yield
    * (src, dst, w). `//` is DuckDB integer floor division — identical to JVM
    * `div` for the positive operands here. */
  def oracleSqlFromEdges(edgeSql: String, iterations: Int = 10): String = {
    val s = PageRank.Scale
    val f = FracScale
    val iters = (1 to iterations).map { k =>
      s"""c$k AS (SELECT e.dst AS node,
                 CAST(sum((r.rank_fp * 85 // 100) * e.frac // $f) AS BIGINT) AS inflow
                 FROM e JOIN r${k - 1} r ON r.node = e.src GROUP BY e.dst),
          r$k AS (SELECT n.node,
                 (SELECT base FROM params) + coalesce(c.inflow, 0) AS rank_fp
                 FROM nodes n LEFT JOIN c$k c ON c.node = n.node)"""
    }.mkString(",\n          ")
    s"""WITH e0 AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS w
                    FROM ($edgeSql) GROUP BY src, dst),
          wout AS (SELECT src, sum(w) AS w_src FROM e0 GROUP BY src),
          e AS (SELECT e0.src, e0.dst, e0.w * $f // wout.w_src AS frac
                FROM e0 JOIN wout ON wout.src = e0.src),
          nodes AS (SELECT src AS node FROM e0 UNION SELECT dst FROM e0),
          params AS (SELECT $s // count(*) AS init,
                     ($s // count(*)) * 15 // 100 AS base FROM nodes),
          r0 AS (SELECT node, (SELECT init FROM params) AS rank_fp FROM nodes),
          $iters
       SELECT node, CAST(rank_fp AS BIGINT) AS rank_fp,
              CAST(rank_fp AS DOUBLE) / $s.0 AS rank
       FROM r$iterations"""
  }
}
