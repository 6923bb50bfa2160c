package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Salted skew join: same rows as the plain join, hot key spread across
  * salt partitions, deterministic across runs. */
class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("salted join == plain join on a 90%-hot-key dataset") {
    // 90% of the big side is one key — the classic skew shape
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 1L, s"row$i")).toDF("k", "v")
    val small = Seq((1L, "hot"), (10L, "ten"), (20L, "twenty"), (999L, "absent-key"))
      .toDF("sk", "name")
    val plain = big.join(small, $"k" === $"sk")
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(big, small, "k", "sk", saltFactor = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.count(_.head == 1L) === 1800)

    // the hot key's rows really spread over multiple salt values
    val bigCols = big.columns.map(big(_))
    val spread = big.filter($"k" === 1L)
      .withColumn("__salt", pmod(xxhash64(bigCols: _*), lit(8)))
      .select("__salt").distinct().count()
    assert(spread >= 6, s"hot key only reached $spread of 8 salt partitions")

    // deterministic across runs
    val again = SkewJoin.saltedJoin(big, small, "k", "sk", saltFactor = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(again === salted)
  }
}
