package graft.crf

/** Per-label precision/recall/F1 over flattened token tags — the reference's
  * `eval()` (`/root/reference/spacy_crfsuite/crf_extractor.py:203-224`):
  * Viterbi predictions, labels = classes minus "O" sorted by
  * `(name[1:], name[0])`, sklearn `classification_report(digits=3)` numbers.
  */
object EvalReport {

  case class LabelScore(label: String, precision: Double, recall: Double, f1: Double, support: Long)
  case class Report(perLabel: IndexedSeq[LabelScore],
                    microP: Double, microR: Double, microF1: Double,
                    macroF1: Double, weightedF1: Double, totalSupport: Long) {
    def formatted: String = {
      val sb = new StringBuilder
      sb.append(f"${"label"}%-12s ${"prec"}%8s ${"rec"}%8s ${"f1"}%8s ${"support"}%8s\n")
      perLabel.foreach { s =>
        sb.append(f"${s.label}%-12s ${s.precision}%8.3f ${s.recall}%8.3f ${s.f1}%8.3f ${s.support}%8d\n")
      }
      sb.append(f"${"micro avg"}%-12s $microP%8.3f $microR%8.3f $microF1%8.3f $totalSupport%8d\n")
      sb.append(f"${"macro f1"}%-12s ${""}%8s ${""}%8s $macroF1%8.3f $totalSupport%8d\n")
      sb.result()
    }
  }

  /** Score flattened (gold, predicted) tag pairs over the given label set. */
  def score(pairs: Iterator[(String, String)], labels: IndexedSeq[String]): Report = {
    val labelSet = labels.toSet
    val tp = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val predCnt = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val goldCnt = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    pairs.foreach { case (g, p) =>
      if (labelSet(g)) goldCnt(g) += 1
      if (labelSet(p)) predCnt(p) += 1
      if (g == p && labelSet(g)) tp(g) += 1
    }
    val per = labels.map { l =>
      val prec = if (predCnt(l) == 0) 0.0 else tp(l).toDouble / predCnt(l)
      val rec = if (goldCnt(l) == 0) 0.0 else tp(l).toDouble / goldCnt(l)
      val f1 = if (prec + rec == 0) 0.0 else 2 * prec * rec / (prec + rec)
      LabelScore(l, prec, rec, f1, goldCnt(l))
    }
    val sumTp = labels.map(tp(_)).sum
    val sumPred = labels.map(predCnt(_)).sum
    val sumGold = labels.map(goldCnt(_)).sum
    val microP = if (sumPred == 0) 0.0 else sumTp.toDouble / sumPred
    val microR = if (sumGold == 0) 0.0 else sumTp.toDouble / sumGold
    val microF1 = if (microP + microR == 0) 0.0 else 2 * microP * microR / (microP + microR)
    val macroF1 = if (per.isEmpty) 0.0 else per.map(_.f1).sum / per.length
    val weightedF1 = if (sumGold == 0) 0.0 else per.map(s => s.f1 * s.support).sum / sumGold
    Report(per, microP, microR, microF1, macroF1, weightedF1, sumGold)
  }

  /** Reference label ordering: classes minus O, sorted by (name[1:], name[0])
    * (`crf_extractor.py:219-220`). */
  def sortedLabels(model: CrfModel): IndexedSeq[String] =
    model.labels.filter(_ != Bilou.NoEntityTag).sortBy(n => (n.drop(1), n.take(1)))

  /** Full reference `eval()` over featurized sentences. */
  def eval(model: CrfModel,
           sents: Seq[(IndexedSeq[Array[FeatAtom]], IndexedSeq[String])]): Report = {
    val pairs = sents.iterator.flatMap { case (feats, gold) =>
      val pred = CrfModel.viterbi(model, feats).map(model.labels)
      gold.iterator.zip(pred.iterator)
    }
    score(pairs, sortedLabels(model))
  }

  /** Eval from raw examples (reference eval CLI, `eval.py:22-55`). */
  def evalExamples(model: CrfModel, examples: Seq[Example], bilou: Boolean = true): Report = {
    val sents = examples.map { ex =>
      val crfToks = Featurizer.goldExampleToCrfTokens(ex, bilou)
      (Featurizer.sentenceFeatures(crfToks, model.config.features), crfToks.map(_.entity))
    }.filter(_._2.nonEmpty)
    eval(model, sents)
  }
}
