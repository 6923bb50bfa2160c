package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree assortativity of the directed link graph — Pearson correlation of
  * (out-degree(src), in-degree(dst)) over edges (Newman 2002). The classic
  * one-number diagnosis of web-graph shape: strongly negative = hub-and-
  * spoke (portals linking leaves), positive = core-periphery rich-club —
  * and a drift alarm for the crawl (a collapsing r usually means the
  * frontier found a link farm).
  *
  * Determinism: every sum in the Pearson formula is a sum of PRODUCTS OF
  * EXACT INTEGER DEGREES, carried in DECIMAL(38,0) (m·Σxy overflows a Long
  * at web scale: degrees ~10^6, m ~10^12 ⇒ terms ~10^24). The only floats
  * are the final single-rounded decimal→double casts and the fixed
  * expression num / (sqrt(a)·sqrt(b)) — sqrt is IEEE-correctly-rounded in
  * both engines (the q73 lesson), so r is bit-identical cross-engine.
  *
  * Scale: one degree aggregation per side, two slim joins keyed by the edge
  * endpoints, one global aggregation — no pair enumeration, nothing beyond
  * the edge list ever shuffles.
  */
object Assortativity {

  /** One row: (m edges, r double) for the distinct directed edge set. */
  def run(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
      .localCheckpoint() // consumed by both degree aggs and the score join
    val outDeg = e.groupBy(col("src").as("n")).agg(count(lit(1)).as("x"))
    val inDeg = e.groupBy(col("dst").as("n")).agg(count(lit(1)).as("y"))
    val dec = "decimal(38,0)"
    val xy = e.join(outDeg.withColumnRenamed("n", "src"), Seq("src"))
      .join(inDeg.withColumnRenamed("n", "dst"), Seq("dst"))
      .select(col("x").cast(dec).as("x"), col("y").cast(dec).as("y"))
    xy.agg(count(lit(1)).cast(dec).as("m"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("m").cast("long").as("m"),
        // zero variance on either side ⇒ r undefined; report 0.0 (the exact
        // decimal compare makes the guard itself deterministic)
        when((col("m") * col("sxx") - col("sx") * col("sx")) === 0 ||
             (col("m") * col("syy") - col("sy") * col("sy")) === 0, lit(0.0))
          .otherwise(
            (col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("m") * col("sxx") - col("sx") * col("sx")).cast("double")) *
               sqrt((col("m") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("r"))
  }

  /** DuckDB oracle: identical integer sums in HUGEINT, identical final
    * float expression. */
  def oracleSqlFromEdges(edgeSql: String): String =
    s"""WITH e AS (SELECT DISTINCT src, dst FROM ($edgeSql)),
          od AS (SELECT src AS n, CAST(count(*) AS HUGEINT) AS x FROM e GROUP BY src),
          id AS (SELECT dst AS n, CAST(count(*) AS HUGEINT) AS y FROM e GROUP BY dst),
          xy AS (SELECT od.x, id.y FROM e
                 JOIN od ON od.n = e.src JOIN id ON id.n = e.dst),
          s AS (SELECT CAST(count(*) AS HUGEINT) AS m, sum(x * y) AS sxy,
                       sum(x) AS sx, sum(y) AS sy,
                       sum(x * x) AS sxx, sum(y * y) AS syy FROM xy)
       SELECT CAST(m AS BIGINT) AS m,
              CASE WHEN m * sxx - sx * sx = 0 OR m * syy - sy * sy = 0 THEN 0.0
                   ELSE CAST(m * sxy - sx * sy AS DOUBLE) /
                        (sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) *
                         sqrt(CAST(m * syy - sy * sy AS DOUBLE)))
              END AS r
       FROM s"""
}
