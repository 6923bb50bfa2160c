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

  // MULTISET compare (row → count), not a Set: the driver's hash compares
  // sorted row LISTS, so a change that only alters duplicate-row multiplicity
  // (e.g. a dedup regression emitting a triple twice) must fail here too.
  private def rowCounts(df: org.apache.spark.sql.DataFrame): Map[String, Int] = {
    val cols = df.columns.sorted
    df.selectExpr(cols.map(c => s"`$c`"): _*).collect()
      .map(_.toSeq.map {
        case null => "NULL"
        case d: Double => d.toString
        case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
        case v => v.toString
      }.mkString("|")).groupBy(identity).map { case (k, v) => k -> v.length }
  }

  private val gated: Seq[(String, () => org.apache.spark.sql.DataFrame, String)] =
    graft.run.GoldenDump.GoldenQueries.map { name =>
      (name,
        () => graft.SparkEntry.queries(name)(spark, graft.run.GoldenDump.sfDirFor(name)),
        graft.run.GoldenDump.goldenFile(name))
    } ++ graft.run.GoldenDump.AuxPins.toSeq.map { case (name, f) =>
      (name, () => f(spark, "/root/testdata/sf0.01"), graft.run.GoldenDump.auxPinFile(name))
    }

  for ((name, mkFresh, pin) <- gated)
    test(s"$name reproduces its golden pin") {
      val fresh = mkFresh()
      val golden = spark.read.parquet(pin)
      assert(fresh.schema.map(f => (f.name, f.dataType)).sortBy(_._1) ===
        golden.schema.map(f => (f.name, f.dataType)).sortBy(_._1), "schema drift")
      val f = rowCounts(fresh)
      val g = rowCounts(golden)
      val onlyFresh = (f.toSet -- g.toSet).take(3)
      val onlyGold = (g.toSet -- f.toSet).take(3)
      assert(f === g,
        s"value drift: ${f.values.sum} fresh vs ${g.values.sum} golden rows; " +
          s"fresh-only=$onlyFresh golden-only=$onlyGold")
    }
}
