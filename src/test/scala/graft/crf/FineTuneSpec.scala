package graft.crf

import org.scalatest.funsuite.AnyFunSuite
import graft.kg.PagesGen

/** fine_tune: deterministic randomized search returns sensible, reproducible
  * hyper-params (reference hyperopt smoke test shape, tests/test_hyperopt.py). */
class FineTuneSpec extends AnyFunSuite {
  test("randomized c1/c2 search returns a reproducible best candidate") {
    val examples = PagesGen.trainingExamples(42L, 60)
    val cfg = graft.kg.KgPipeline.pipelineConfig.copy(maxIter = 100)
    val r1 = FineTune.run(examples, cfg, cv = 3, nIter = 6, seed = 7L)
    val r2 = FineTune.run(examples, cfg, cv = 3, nIter = 6, seed = 7L)
    assert(r1.best === r2.best) // deterministic
    assert(r1.all.length === 6)
    assert(r1.best.c1 > 0 && r1.best.c2 > 0)
    assert(r1.best.meanF1 >= 0.9, s"best ${r1.best}") // synthetic language is easy
    assert(r1.all.forall(c => c.meanF1 >= 0.0 && c.meanF1 <= 1.0))
  }

  test("dense-feature atoms flow through the window featurizer") {
    // the dense path has no vector source in this environment; the mechanics
    // (numeric atoms named like pycrfsuite's nested-dict flattening) are real
    val tok = CrfToken("word", "NN", "O", "xxxx", dense = Array(0.5, 0.0, -1.25))
    val feats = Featurizer.featuresForToken(IndexedSeq(tok), 0,
      IndexedSeq(IndexedSeq("low"), IndexedSeq("dense_features"), IndexedSeq("low")))
    val dense = feats.filter(_.attr.contains("dense_features"))
    assert(dense.toSeq === Seq(
      FeatAtom("0:dense_features:text_dense_features:0", 0.5),
      FeatAtom("0:dense_features:text_dense_features:2", -1.25))) // zeros skipped
  }
}
