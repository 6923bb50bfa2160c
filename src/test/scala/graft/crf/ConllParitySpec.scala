package graft.crf

import org.scalatest.funsuite.AnyFunSuite
import graft.io.ConllReader
import graft.kg.Synth

/** Parity gate #2 (SURVEY §7 step 2): the CoNLL path with its quirks, plus a
  * train/eval P/R ≥ 0.95 gate on a deterministic synthetic CoNLL corpus using
  * the reference's CoNLL-03 notebook config
  * (`/root/reference/examples/02 - CoNLL 2003.ipynb` cell 4: pos/pos2
  * features, c1=0.01, c2=0.22, bilou=False). */
class ConllParitySpec extends AnyFunSuite {

  /** CoNLL notebook config (notebook 02 cell 4). */
  val conllConfig: CrfConfig = CrfConfig(
    features = IndexedSeq(
      IndexedSeq("low", "title", "upper", "pos", "pos2"),
      IndexedSeq("low", "bias", "prefix5", "prefix2", "suffix5", "suffix3",
        "suffix2", "upper", "title", "digit", "pos", "pos2"),
      IndexedSeq("low", "title", "upper", "pos", "pos2")),
    c1 = 0.01, c2 = 0.22, maxIter = 200, bilou = false)

  test("quirk Q1: pre-tokenized CoNLL input loses its final token") {
    val ex = ConllReader.readString("Foo NNP B-NP B-ORG\nbar NN I-NP O\n. . O O\n").head
    assert(ex.tokens.length === 3)
    val crfToks = Featurizer.goldExampleToCrfTokens(ex)
    assert(crfToks.length === 2) // trailing "." silently dropped (features.py:127-129)
    assert(crfToks.map(_.text) === IndexedSeq("Foo", "bar"))
  }

  test("quirk Q4: IOB entity names round-trip U-B-ORG → B-ORG when bilou=false") {
    val ex = ConllReader.readString("Foo NNP B-NP B-ORG\nbar NN I-NP O\n. . O O\n").head
    val withBilou = Featurizer.goldExampleToCrfTokens(ex, bilou = true)
    assert(withBilou.map(_.entity) === IndexedSeq("U-B-ORG", "O"))
    val noBilou = Featurizer.goldExampleToCrfTokens(ex, bilou = false)
    assert(noBilou.map(_.entity) === IndexedSeq("B-ORG", "O"))
  }

  test("quirk Q5: misaligned gold entities are silently dropped") {
    val toks = IndexedSeq(Tok("ab", 0, 2, "NN", "xx"), Tok("cd", 3, 5, "NN", "xx"))
    // span (1,4) aligns to no token boundary → dropped
    val tags = Bilou.tagsFromOffsets(toks, Seq((1, 4, "X")))
    assert(tags === IndexedSeq("O", "O"))
  }

  lazy val trainCorpus: IndexedSeq[Example] = ConllReader.readString(Synth.conllCorpus(7L, 0, 400))
  lazy val evalCorpus: IndexedSeq[Example] = ConllReader.readString(Synth.conllCorpus(7L, 10000, 100))
  lazy val model: CrfModel = Trainer.trainExamples(trainCorpus, conllConfig, bilou = false)

  test("synthetic CoNLL train/eval reaches P/R >= 0.95 (BASELINE gate)") {
    val rep = EvalReport.evalExamples(model, evalCorpus, bilou = false)
    assert(rep.microP >= 0.95, rep.formatted)
    assert(rep.microR >= 0.95, rep.formatted)
  }

  test("span outputs on eval sentences match gold (byte-identical values)") {
    // bilou=False decode: every non-O token is its own span (quirk Q4 output
    // shape) — compare against the CoNLL gold entity list directly.
    var total = 0
    var exact = 0
    for (ex <- evalCorpus) {
      val crfToks = Featurizer.toCrfTokens(ex.tokens, None)
      val feats = Featurizer.sentenceFeatures(crfToks, model.config.features)
      val marg = CrfModel.marginals(model, feats)
      val pred = SpanDecode.fromMarginals(model, ex.text, Featurizer.tokensWithoutCls(ex.tokens), marg)
      val gold = ex.entities.filter(_.end <= ex.tokens.dropRight(1).lastOption.map(_.end).getOrElse(0))
      total += gold.length
      exact += pred.map(p => (p.start, p.end, p.value, p.entity))
        .intersect(gold.map(g => (g.start, g.end, g.value, g.entity))).length
      // every predicted value must be byte-identical to its text slice
      pred.foreach(p => assert(p.value === ex.text.substring(p.start, p.end)))
    }
    assert(total > 0)
    assert(exact.toDouble / total >= 0.95, s"span match $exact/$total")
  }
}
