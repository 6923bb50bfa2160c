package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Drift gate for the golden KG-stage pins that back the driver's q50–q53
  * oracles: a fresh pipeline run must reproduce the checked-in parquet
  * byte-for-value. Fails ⇒ a pipeline/model change altered the outputs —
  * either fix the regression or regenerate deliberately with
  * `sbt "runMain graft.run.GoldenDump"` and explain the change. */
class GoldenKgSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def rowSet(df: org.apache.spark.sql.DataFrame): Set[String] = {
    val cols = df.columns.sorted
    df.selectExpr(cols.map(c => s"`$c`"): _*).collect()
      .map(_.toSeq.map {
        case null => "NULL"
        case d: Double => d.toString
        case v => v.toString
      }.mkString("|")).toSet
  }

  for (name <- graft.run.GoldenDump.GoldenQueries)
    test(s"$name reproduces its golden pin") {
      val fresh = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val golden = spark.read.parquet(graft.run.GoldenDump.goldenFile(name))
      assert(fresh.schema.map(f => (f.name, f.dataType)).sortBy(_._1) ===
        golden.schema.map(f => (f.name, f.dataType)).sortBy(_._1), "schema drift")
      val f = rowSet(fresh)
      val g = rowSet(golden)
      val onlyFresh = (f -- g).take(3)
      val onlyGold = (g -- f).take(3)
      assert(f === g,
        s"value drift: ${f.size} fresh vs ${g.size} golden rows; " +
          s"fresh-only=$onlyFresh golden-only=$onlyGold")
    }
}
