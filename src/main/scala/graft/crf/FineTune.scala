package graft.crf

/** Hyper-parameter fine-tuning — reference `CRFExtractor.fine_tune`
  * (`/root/reference/spacy_crfsuite/crf_extractor.py:226-281`):
  * RandomizedSearchCV over c1 ~ Exp(scale 0.5), c2 ~ Exp(scale 0.05) with
  * k-fold cross-validation scored by label-weighted F1 (O excluded).
  *
  * Candidates × folds are embarrassingly parallel; each small train runs on
  * its own thread (the trainer's gradient itself is multi-core, so this uses
  * a bounded pool). Deterministic: draws come from splitmix64(seed, i). */
object FineTune {

  case class Candidate(c1: Double, c2: Double, meanF1: Double)
  case class Result(best: Candidate, all: IndexedSeq[Candidate])

  /** Exponential draw via inverse CDF from a deterministic uniform. */
  private def expDraw(seed: Long, i: Long, scale: Double): Double = {
    val h = graft.kg.Synth.splitmix64(seed ^ (0x9e3779b97f4a7c15L * (i + 1)))
    val u = ((h >>> 11).toDouble / (1L << 53).toDouble) max 1e-12
    -scale * math.log(u)
  }

  def run(examples: IndexedSeq[Example], baseConfig: CrfConfig, cv: Int = 3,
          nIter: Int = 10, seed: Long = 42L, bilou: Boolean = true): Result = {
    require(examples.length >= cv, s"need at least $cv examples for $cv folds")
    // featurize once (tags depend only on bilou flag, features on config window)
    val prepped = examples.map { ex =>
      val toks = Featurizer.goldExampleToCrfTokens(ex, bilou)
      (Featurizer.sentenceFeatures(toks, baseConfig.features), toks.map(_.entity))
    }.filter(_._2.nonEmpty)
    val folds = prepped.zipWithIndex.groupBy(_._2 % cv).view.mapValues(_.map(_._1)).toMap

    val candidates = (0 until nIter).map { i =>
      (expDraw(seed, i * 2L, 0.5), expDraw(seed, i * 2L + 1, 0.05))
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, Runtime.getRuntime.availableProcessors / 4))
    try {
      val futures = candidates.map { case (c1, c2) =>
        pool.submit(new java.util.concurrent.Callable[Candidate] {
          def call(): Candidate = {
            val cfg = baseConfig.copy(c1 = c1, c2 = c2)
            val f1s = (0 until cv).map { f =>
              val train = (0 until cv).filter(_ != f).flatMap(folds.getOrElse(_, IndexedSeq.empty))
              val test = folds.getOrElse(f, IndexedSeq.empty)
              if (train.isEmpty || test.isEmpty) 0.0
              else {
                val m = Trainer.train(train, cfg)
                EvalReport.eval(m, test).weightedF1
              }
            }
            Candidate(c1, c2, f1s.sum / f1s.length)
          }
        })
      }
      val all = futures.map(_.get()).toIndexedSeq
      Result(all.maxBy(c => (c.meanF1, -c.c1, -c.c2)), all)
    } finally pool.shutdown()
  }
}
