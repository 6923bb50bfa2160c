package graft.crf

import breeze.linalg.DenseVector
import breeze.optimize.{DiffFunction, LBFGS, OWLQN}

/** From-scratch linear-chain CRF trainer: maximum likelihood with elastic-net
  * regularization, optimized with breeze L-BFGS / OWL-QN.
  *
  * Mirrors the reference's training contract (libcrfsuite `lbfgs` with
  * `c1`/`c2`, `all_possible_transitions=True`; documented at
  * `/root/reference/spacy_crfsuite/compat.py:15-74`, invoked from
  * `crf_extractor.py:167-201`): loss = Σ_sents −log P(y|x) + c1·‖w‖₁ + c2·‖w‖₂²,
  * L1 handled by OWL-QN (crfsuite does exactly this when c1 > 0). State
  * features exist for observed (attribute, label) pairs only
  * (`all_possible_states=False` default); transitions are the dense L×L matrix
  * (`all_possible_transitions=True`).
  *
  * Weight-for-weight equality with libcrfsuite is not a goal (different
  * optimizer internals); the parity gate is span-level P/R (SURVEY §7).
  *
  * Scale note: training corpora are curated and small (the reference's largest
  * is CoNLL03's 14k sentences) — feature extraction is distributed via
  * Dataset.map upstream, the optimizer itself runs on the driver over encoded
  * (int-indexed) sentences. The gradient is embarrassingly parallel over
  * sentences; `gradientChunks` uses all driver cores.
  */
object Trainer {

  /** A sentence encoded against the feature index: per token the attr ids +
    * scales, plus gold label ids. */
  final case class EncSent(attrIds: Array[Array[Int]], attrW: Array[Array[Double]], gold: Array[Int])

  final class FeatureIndex(
      val labels: IndexedSeq[String],
      val attrs: IndexedSeq[String],
      val attrParam: Array[Array[Int]], // attrId → labelId → param idx or -1
      val numStateParams: Int) extends Serializable {
    val labelIdx: Map[String, Int] = labels.zipWithIndex.toMap
    val attrIdx: Map[String, Int] = attrs.zipWithIndex.toMap
    def numParams: Int = numStateParams + labels.length * labels.length
  }

  /** Build label + attribute dictionaries and the observed (attr,label) param
    * layout from the training data. Label order = first appearance.
    *
    * `minFreq` is crfsuite's feature cut-off (ref `compat.py:24-28`): a state
    * feature (attr,label) gets a parameter only if its occurrence frequency
    * exceeds `minFreq` ("no greater than" is dropped). Frequency is the sum
    * of ABSOLUTE feature values (binary features have weight 1.0 ⇒ the
    * occurrence count, crfsuite's behavior) — a SIGNED sum would silently
    * freeze dense (zero-centered) feature slots whose weights cancel, even
    * at the default minFreq=0.0 "no cut-off". Attributes left with no
    * surviving label slot are dropped from the dictionary entirely.
    *
    * `allPossibleStates` (crfsuite all_possible_states=True, ref
    * compat.py:30-42) generates the full grid over the SURVIVING attributes ×
    * all labels — negative state features included. The cut is applied to
    * attributes FIRST, then the grid is generated; the same order as the
    * distributed trainer ([[SparkTrainer]]), so both produce one feature
    * space for one config (gated by SparkTrainerSpec's parity test). */
  def buildIndex(sents: Seq[(IndexedSeq[Array[FeatAtom]], IndexedSeq[String])],
                 minFreq: Double = 0.0, allPossibleStates: Boolean = false): FeatureIndex = {
    val labels = scala.collection.mutable.LinkedHashSet.empty[String]
    val attrsAll = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    for ((feats, tags) <- sents) {
      tags.foreach(labels += _)
      feats.foreach(_.foreach(a => if (!attrsAll.contains(a.attr)) attrsAll(a.attr) = attrsAll.size))
    }
    val labelSeq = labels.toIndexedSeq
    val lIdx = labelSeq.zipWithIndex.toMap
    val freq = Array.fill(attrsAll.size)(new Array[Double](labelSeq.length))
    for ((feats, tags) <- sents; t <- feats.indices; a <- feats(t))
      freq(attrsAll(a.attr))(lIdx(tags(t))) += math.abs(a.weight)
    val kept = attrsAll.keysIterator.zipWithIndex
      .filter { case (_, i) => freq(i).exists(_ > minFreq) }.toIndexedSeq
    var p = 0
    val attrParam =
      if (allPossibleStates)
        kept.map { _ => Array.tabulate(labelSeq.length) { _ => val k = p; p += 1; k } }.toArray
      else kept.map { case (_, i) =>
        freq(i).map { fr => if (fr > minFreq) { val k = p; p += 1; k } else -1 }
      }.toArray
    new FeatureIndex(labelSeq, kept.map(_._1), attrParam, p)
  }

  def encode(idx: FeatureIndex,
             sents: Seq[(IndexedSeq[Array[FeatAtom]], IndexedSeq[String])]): IndexedSeq[EncSent] =
    sents.iterator.map { case (feats, tags) =>
      val ids = feats.map(_.flatMap(a => idx.attrIdx.get(a.attr)).toArray).toArray
      val ws = feats.map(_.filter(a => idx.attrIdx.contains(a.attr)).map(_.weight)).toArray
      EncSent(ids, ws, tags.map(idx.labelIdx).toArray)
    }.toIndexedSeq

  /** −log-likelihood and gradient for one sentence, accumulated into `grad`. */
  private def sentenceNllGrad(idx: FeatureIndex, w: Array[Double], s: EncSent,
                              grad: Array[Double]): Double = {
    val L = idx.labels.length
    val T = s.gold.length
    if (T == 0) return 0.0
    val nS = idx.numStateParams
    // node potentials
    val psi = Array.ofDim[Double](T, L)
    var t = 0
    while (t < T) {
      val ids = s.attrIds(t); val ws = s.attrW(t)
      var k = 0
      while (k < ids.length) {
        val params = idx.attrParam(ids(k))
        var y = 0
        while (y < L) {
          val p = params(y)
          if (p >= 0) psi(t)(y) += w(p) * ws(k)
          y += 1
        }
        k += 1
      }
      t += 1
    }
    val trans = Array.tabulate(L, L)((i, j) => w(nS + i * L + j))
    val (marg, logZ, alpha, beta) = Inference.forwardBackward(psi, trans)

    // gold score
    var goldScore = psi(0)(s.gold(0))
    t = 1
    while (t < T) { goldScore += trans(s.gold(t - 1))(s.gold(t)) + psi(t)(s.gold(t)); t += 1 }

    // state gradient: E[f] − f(gold)
    t = 0
    while (t < T) {
      val ids = s.attrIds(t); val ws = s.attrW(t)
      var k = 0
      while (k < ids.length) {
        val params = idx.attrParam(ids(k))
        var y = 0
        while (y < L) {
          val p = params(y)
          if (p >= 0) {
            var g = marg(t)(y) * ws(k)
            if (y == s.gold(t)) g -= ws(k)
            grad(p) += g
          }
          y += 1
        }
        k += 1
      }
      t += 1
    }
    // transition gradient via pairwise marginals
    t = 0
    while (t < T - 1) {
      var y = 0
      while (y < L) {
        var y2 = 0
        while (y2 < L) {
          val xi = math.exp(alpha(t)(y) + trans(y)(y2) + psi(t + 1)(y2) + beta(t + 1)(y2) - logZ)
          var g = xi
          if (y == s.gold(t) && y2 == s.gold(t + 1)) g -= 1.0
          grad(nS + y * L + y2) += g
          y2 += 1
        }
        y += 1
      }
      t += 1
    }
    logZ - goldScore
  }

  /** Executor-side entry for the distributed trainer (SparkTrainer). */
  def sentenceNllGradPublic(idx: FeatureIndex, w: Array[Double], s: EncSent,
                            grad: Array[Double]): Double = sentenceNllGrad(idx, w, s, grad)

  /** Train from already-featurized sentences. Dispatches on
    * `config.algorithm`: `lbfgs` (this batch path, reference default) or the
    * online crfsuite algorithms `l2sgd`/`ap`/`pa`/`arow`
    * ([[OnlineTrainers]], ref compat.py:15-23). */
  def train(sents: Seq[(IndexedSeq[Array[FeatAtom]], IndexedSeq[String])],
            config: CrfConfig): CrfModel = {
    require(sents.nonEmpty, "empty training set")
    if (OnlineTrainers.supports(config.algorithm)) return OnlineTrainers.train(sents, config)
    require(config.algorithm == "lbfgs", s"unknown algorithm: ${config.algorithm}")
    val idx = buildIndex(sents, config.minFreq, config.allPossibleStates)
    val enc = encode(idx, sents)
    val n = idx.numParams
    // fixed chunk size, NOT core-count-derived: keeps the gradient summation
    // order (and therefore the trained weights) bit-identical across machines
    // and ActiveProcessorCount settings; the pool still uses all cores
    val chunks = enc.grouped(64).toArray

    val f = new DiffFunction[DenseVector[Double]] {
      def calculate(wv: DenseVector[Double]): (Double, DenseVector[Double]) = {
        val w = wv.data
        val partials = chunks.par2Map { chunk =>
          val g = new Array[Double](n)
          var loss = 0.0
          chunk.foreach(s => loss += sentenceNllGrad(idx, w, s, g))
          (loss, g)
        }
        var loss = 0.0
        val grad = new Array[Double](n)
        partials.foreach { case (l, g) =>
          loss += l
          var i = 0
          while (i < n) { grad(i) += g(i); i += 1 }
        }
        // L2 (crfsuite: + c2·‖w‖², grad 2·c2·w); L1 handled by OWL-QN below
        if (config.c2 > 0) {
          var i = 0
          while (i < n) { loss += config.c2 * w(i) * w(i); grad(i) += 2 * config.c2 * w(i); i += 1 }
        }
        (loss, DenseVector(grad))
      }
    }

    val init = DenseVector.zeros[Double](n)
    val wOpt =
      if (config.c1 > 0)
        new OWLQN[Int, DenseVector[Double]](config.maxIter, 6, config.c1, 1e-8).minimize(f, init)
      else
        new LBFGS[DenseVector[Double]](config.maxIter, 6, 1e-8).minimize(f, init)

    val w = wOpt.data
    val L = idx.labels.length
    val stateW = idx.attrs.indices.iterator.map { a =>
      val arr = new Array[Double](L)
      var y = 0
      while (y < L) { val p = idx.attrParam(a)(y); if (p >= 0) arr(y) = w(p); y += 1 }
      idx.attrs(a) -> arr
    }.toMap
    val transW = Array.tabulate(L, L)((i, j) => w(idx.numStateParams + i * L + j))
    CrfModel(idx.labels, stateW, transW, config)
  }

  /** Train from raw examples (reference train CLI flow, `train.py:71-129`).
    * `vectors` feeds the dense-features path when
    * `config.useDenseFeatures` is on (reference: the spaCy md model's vocab). */
  def trainExamples(examples: Seq[Example], config: CrfConfig, bilou: Boolean = true,
                    vectors: Option[VectorSource] = None): CrfModel = {
    val dense =
      if (config.useDenseFeatures) vectors.map((_, config.denseFeaturesClsPooling)) else None
    val sents = examples.map { ex =>
      val crfToks = Featurizer.goldExampleToCrfTokens(ex, bilou, dense)
      (Featurizer.sentenceFeatures(crfToks, config.features), crfToks.map(_.entity))
    }.filter(_._2.nonEmpty)
    train(sents, config)
  }

  /** Tiny fixed-pool parallel map (scala-parallel-collections isn't a
    * first-class dep; this keeps the gradient multi-core on the driver). */
  implicit private class ParOps[A](private val xs: Array[A]) {
    def par2Map[B: scala.reflect.ClassTag](fn: A => B): Array[B] = {
      import java.util.concurrent._
      val pool = ForkJoinPool.commonPool()
      val tasks = xs.map(a => pool.submit(new Callable[B] { def call(): B = fn(a) }))
      tasks.map(_.get())
    }
  }
}
