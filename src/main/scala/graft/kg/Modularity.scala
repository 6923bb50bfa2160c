package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Newman modularity of a node partition over the undirected link graph —
  * the community-quality score for the KG's clustering outputs ("how
  * host-clustered is the web linkage", "did canonicalization produce
  * communities or hairballs"). Q = Σ_c [ e_c/m − (d_c/2m)² ] where m is the
  * undirected edge count, e_c the intra-community edge count, and d_c the
  * community's degree sum.
  *
  * Determinism: everything is computed on EXACT integers — the per-community
  * numerator is 4·m·e_c − d_c², carried in DECIMAL(38,0) because at web
  * scale (m ~ 10^12) both 4·m·e_c and d_c² overflow a Long (4·10^24) while
  * fitting decimal38 with room to spare. The only floats are two
  * correctly-rounded casts of exact integers and ONE IEEE division per row,
  * so contributions are bit-identical across engines and parallelism (the
  * DuckDB oracle uses HUGEINT for the same reason — both engines round the
  * exact integer to double once).
  *
  * Scale: one distinct-edge shuffle, one degree aggregation, one
  * community aggregation — all slim rows; m is a single-row count used as a
  * literal (the k-means centroids-as-literals discipline: the plan never
  * carries a 1-row cross join). No pair enumeration of any kind.
  */
object Modularity {

  /** Per-community rows (community, n_intra, deg_sum, q_part) for the
    * undirected distinct edge set of `edges`; `community` maps a node column
    * to its community label. Global modularity = sum(q_part). Communities
    * whose nodes have no intra edges still appear (their d_c² term counts).
    */
  def run(edges: DataFrame, community: Column => Column,
          srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint() // consumed by m, degrees, and the intra count
    val m = und.count() // single Long — enters the plan as a literal
    require(m > 0, "modularity needs at least one edge")
    val dec = "decimal(38,0)"
    val deg = und.select(col("u").as("node")).union(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val dC = deg.withColumn("community", community(col("node")))
      .groupBy("community").agg(sum(col("deg")).as("deg_sum"))
    val intra = und.filter(community(col("u")) === community(col("v")))
      .groupBy(community(col("u")).as("community"))
      .agg(count(lit(1)).as("n_intra"))
    val num = (lit(m).cast(dec) * lit(4L) * coalesce(col("n_intra"), lit(0L))
      - col("deg_sum").cast(dec) * col("deg_sum"))
    val den = (lit(m).cast(dec) * lit(4L) * lit(m)).cast("double")
    dC.join(intra, Seq("community"), "left_outer")
      .select(col("community"),
        coalesce(col("n_intra"), lit(0L)).as("n_intra"),
        col("deg_sum"),
        (num.cast("double") / den).as("q_part"))
  }

  /** DuckDB oracle: identical integer formulation in HUGEINT, one
    * double-cast + division per row. `commExpr(x)` must render the same
    * community mapping `run` was given, over the SQL expression `x`. */
  def oracleSqlFromEdges(edgeSql: String, commExpr: String => String): String =
    s"""WITH und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
                     FROM ($edgeSql) WHERE src <> dst),
          m AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM und),
          deg AS (SELECT node, count(*) AS deg FROM
                    (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
                  GROUP BY node),
          dc AS (SELECT ${commExpr("node")} AS community,
                        CAST(sum(deg) AS BIGINT) AS deg_sum
                 FROM deg GROUP BY 1),
          intra AS (SELECT ${commExpr("u")} AS community,
                           CAST(count(*) AS BIGINT) AS n_intra
                    FROM und WHERE ${commExpr("u")} = ${commExpr("v")}
                    GROUP BY 1)
       SELECT dc.community, coalesce(intra.n_intra, 0) AS n_intra, dc.deg_sum,
              CAST((SELECT m FROM m) * 4 * CAST(coalesce(intra.n_intra, 0) AS HUGEINT)
                   - CAST(dc.deg_sum AS HUGEINT) * dc.deg_sum AS DOUBLE)
              / CAST((SELECT m FROM m) * 4 * (SELECT m FROM m) AS DOUBLE) AS q_part
       FROM dc LEFT JOIN intra ON intra.community = dc.community"""
}
