package graft
object RunOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.01")
    df.show(10, false)
    println("ROWS=" + df.count())
  }
}
