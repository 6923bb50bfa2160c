package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Gates for the stage manifest's per-partition lineage: every part file is
  * named with its row count and on-disk bytes, the counts sum to the stage
  * total, resume skips recompute, and a manifest-less directory is treated
  * as a torn write. */
class CheckpointsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("manifest carries per-partition rows and bytes summing to the total") {
    val root = java.nio.file.Files.createTempDirectory("ckpt").toString
    var computes = 0
    def go() = Checkpoints.stage(spark, root, "s1", _ => ()) {
      computes += 1
      (1L to 100L).toDF("v").repartition(4)
    }
    go()
    val m = java.nio.file.Files.readString(Checkpoints.manifestPath(root, "s1"))
    assert(m.contains("\"rows\":100") && m.contains("\"committed\":true"))
    val parts = """\{"file":"([^"]+)","rows":(\d+),"bytes":(\d+)\}""".r
      .findAllMatchIn(m).map(x => (x.group(1), x.group(2).toLong, x.group(3).toLong)).toSeq
    assert(parts.length === 4, s"expected 4 partition entries in: $m")
    assert(parts.map(_._2).sum === 100L)
    assert(parts.forall(_._3 > 0L), "every part file reports its real bytes")
    assert(parts.forall(p => java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "s1", p._1))), "manifest names real files")
    // resume: no recompute, identical data
    assert(go().as[Long].collect().sorted === (1L to 100L).toArray)
    assert(computes === 1, "resume must skip the compute")
  }

  test("a directory without a manifest is a torn write and recomputes") {
    val root = java.nio.file.Files.createTempDirectory("ckpt2").toString
    var computes = 0
    def go() = Checkpoints.stage(spark, root, "s", _ => ()) {
      computes += 1; Seq(1L, 2L).toDF("v")
    }
    go()
    java.nio.file.Files.delete(Checkpoints.manifestPath(root, "s"))
    go()
    assert(computes === 2)
  }
}
