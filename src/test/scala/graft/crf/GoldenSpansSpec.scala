package graft.crf

import org.scalatest.funsuite.AnyFunSuite
import graft.kg.{KgPipeline, Synth}

/** Golden-output regression pin (SURVEY §5 test-plan item d): decoded spans
  * for a fixed eval slice are checked into resources as JSON; any change to
  * tokenizer/featurizer/trainer/decoder that shifts ANY span fails here.
  * Regenerate deliberately with `Test/runMain graft.crf.GoldenSpansSpec`
  * after an intended behavior change.
  */
class GoldenSpansSpec extends AnyFunSuite {

  test("decoded spans byte-match the checked-in golden JSON") {
    val got = GoldenSpansSpec.render()
    val want = {
      val is = getClass.getResourceAsStream("/golden_spans.json")
      assert(is != null, "golden_spans.json missing — run Test/runMain graft.crf.GoldenSpansSpec")
      val src = scala.io.Source.fromInputStream(is, "UTF-8")
      try src.mkString finally src.close()
    }
    assert(got === want)
  }
}

object GoldenSpansSpec {
  /** Deterministic span dump for eval sentences 5000..5099. */
  def render(): String = {
    val model = KgPipeline.trainModel(42L, nTrain = 400)
    val decoder = new CrfDecoder(model)
    val sb = new StringBuilder("[\n")
    var first = true
    for (i <- 5000L until 5100L) {
      val text = Synth.sentence(42L, i).text
      for (s <- decoder.process(text)) {
        if (!first) sb.append(",\n")
        first = false
        sb.append(f"""{"sent":$i,"start":${s.start},"end":${s.end},"value":${q(s.value)},"entity":${q(s.entity)},"conf":${s.confidence}%.6f}""")
      }
    }
    sb.append("\n]\n").result()
  }

  private def q(s: String): String = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get("src/test/resources/golden_spans.json")
    java.nio.file.Files.writeString(out, render())
    println(s"wrote $out")
  }
}
