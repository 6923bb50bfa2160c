package graft.crf

import org.scalatest.funsuite.AnyFunSuite
import graft.kg.{KgPipeline, Synth}

/** The cached decoder must be span-identical to the reference-shaped
  * `SpanDecode.process` path on thousands of sentences (cache correctness),
  * and measurably faster. */
class CrfDecoderSpec extends AnyFunSuite {

  lazy val model: CrfModel = KgPipeline.trainModel(42L, nTrain = 200)

  test("CrfDecoder produces identical spans to SpanDecode on 3000 sentences") {
    val decoder = new CrfDecoder(model)
    var n = 0
    for (i <- 0L until 3000L) {
      val text = Synth.sentence(42L, i).text
      val toks = graft.text.RuleTokenizer.tokenizeWithCls(text)
      val fast = decoder.processTokens(text, toks)
      val slow = SpanDecode.process(model, text, toks)
      // spans exactly equal; confidence within float-summation-order noise
      assert(fast.map(s => (s.start, s.end, s.value, s.entity)) ===
        slow.map(s => (s.start, s.end, s.value, s.entity)), s"sentence $i: $text")
      fast.zip(slow).foreach { case (f, sl) =>
        assert(math.abs(f.confidence - sl.confidence) < 1e-9, s"confidence, sentence $i")
      }
      n += fast.length
    }
    assert(n > 1000)
  }

  test("decoder throughput: cached path beats uncached") {
    val texts = (0L until 4000L).map(i => Synth.sentence(42L, i).text)
    // warmup both
    val d0 = new CrfDecoder(model)
    texts.take(500).foreach(d0.process)
    texts.take(500).foreach(t => SpanDecode.process(model, t, graft.text.RuleTokenizer.tokenizeWithCls(t)))

    val t0 = System.nanoTime()
    val decoder = new CrfDecoder(model)
    texts.foreach(decoder.process)
    val fast = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    texts.foreach(t => SpanDecode.process(model, t, graft.text.RuleTokenizer.tokenizeWithCls(t)))
    val slow = (System.nanoTime() - t1) / 1e9

    info(f"cached ${texts.length / fast}%.0f sents/s vs uncached ${texts.length / slow}%.0f sents/s (${slow / fast}%.1fx)")
    assert(fast < slow)
  }
}
