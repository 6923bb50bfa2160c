package graft.crf

import graft.text.PyStr

/** One feature atom: a crfsuite-style attribute string plus its scale.
  * String-valued features stringize to `key:value` with weight 1.0; booleans
  * keep the bare key with weight 1.0/0.0; numerics keep the key with the value
  * as weight — exactly python-crfsuite's `ItemSequence` conversion, which is
  * what makes the reference's `explain()` print atoms like `0:low:show`
  * (`/root/reference/README.md:199-209`). Zero-weight atoms are dropped: they
  * contribute nothing to potentials or gradients. */
final case class FeatAtom(attr: String, weight: Double)

/** Feature extraction: reference `Featurizer` (`features.py:24-136`) +
  * `CRFExtractor._features_for_token` (`crf_extractor.py:504-549`). */
object Featurizer {

  /** `function_dict` (`crf_extractor.py:67-84`), Python-exact semantics. */
  private def featureValue(name: String, t: CrfToken): Any = name match {
    case "low"     => PyStr.lower(t.text)
    case "title"   => PyStr.istitle(t.text)
    case "prefix5" => PyStr.prefix(t.text, 5)
    case "prefix2" => PyStr.prefix(t.text, 2)
    case "suffix5" => PyStr.suffix(t.text, 5)
    case "suffix3" => PyStr.suffix(t.text, 3)
    case "suffix2" => PyStr.suffix(t.text, 2)
    case "suffix1" => PyStr.suffix(t.text, 1)
    case "bias"    => "bias"
    case "pos"     => t.pos
    case "pos2"    => if (t.pos == null) null else PyStr.prefix(t.pos, 2)
    case "upper"   => PyStr.isupper(t.text)
    case "digit"   => PyStr.isdigit(t.text)
    case "shape"   => t.shape
    case other     => throw new IllegalArgumentException(s"unknown feature: $other")
  }

  /** Reference `tokens_without_cls` (`features.py:127-129`): ALWAYS drops the
    * last token. For spaCy-tokenized input that is the `__CLS__` sentinel;
    * for pre-tokenized CoNLL input it silently drops the final real token —
    * quirk Q1, deliberately replicated for parity. */
  def tokensWithoutCls(tokens: IndexedSeq[Tok]): IndexedSeq[Tok] = tokens.dropRight(1)

  /** Reference `Featurizer.__call__` (`features.py:38-63`): tokens → CRFTokens
    * with gold labels (or "N/A" at inference). */
  def toCrfTokens(tokens: IndexedSeq[Tok], entities: Option[IndexedSeq[String]]): IndexedSeq[CrfToken] = {
    val toks = tokensWithoutCls(tokens)
    toks.zipWithIndex.map { case (t, i) =>
      CrfToken(t.text, t.pos, entities.map(_(i)).getOrElse("N/A"), t.shape)
    }
  }

  /** Reference `apply_bilou_schema` (`features.py:96-125`). */
  def applyBilouSchema(tokens: IndexedSeq[Tok], entities: IndexedSeq[Span]): IndexedSeq[String] =
    Bilou.tagsFromOffsets(tokensWithoutCls(tokens), entities.map(e => (e.start, e.end, e.entity)))

  /** Reference `gold_example_to_crf_tokens` (`train.py:17-60`): the composed
    * train/eval prep for one example. `dense` = (vector source, CLS pooling)
    * when the dense-features path is on. */
  def goldExampleToCrfTokens(example: Example, bilou: Boolean = true,
                             dense: Option[(VectorSource, String)] = None): IndexedSeq[CrfToken] = {
    val tokens =
      if (example.pretokenized) example.tokens
      else graft.text.RuleTokenizer.tokenizeWithCls(example.text)
    val tags0 = applyBilouSchema(tokens, example.entities)
    val tags = if (bilou) tags0 else Bilou.removePrefixes(tags0)
    dense match {
      case Some((src, pooling)) => DenseFeatures.toCrfTokens(tokens, Some(tags), src, pooling)
      case None                 => toCrfTokens(tokens, Some(tags))
    }
  }

  /** Atoms one window SLOT contributes for one token (factored out so the
    * decoder can cache per-(slot, token) contributions). `prefix` is the
    * offset rendered as a string ("-1"/"0"/"1"). */
  def slotAtoms(token: CrfToken, prefix: String, features: IndexedSeq[String],
                out: scala.collection.mutable.ArrayBuffer[FeatAtom]): Unit = {
    for (feature <- features) {
      if (feature == "pattern") {
        for ((pName, matched) <- token.pattern)
          if (matched) out += FeatAtom(s"$prefix:pattern:$pName", 1.0)
      } else if (feature == "dense_features") {
        var i = 0
        while (i < token.dense.length) {
          if (token.dense(i) != 0.0)
            out += FeatAtom(s"$prefix:dense_features:text_dense_features:$i", token.dense(i))
          i += 1
        }
      } else featureValue(feature, token) match {
        case s: String  => out += FeatAtom(s"$prefix:$feature:$s", 1.0)
        case true       => out += FeatAtom(s"$prefix:$feature", 1.0)
        case false      => // weight 0 — contributes nothing
        case null       => out += FeatAtom(s"$prefix:$feature:None", 1.0)
        case other      => throw new IllegalStateException(s"unexpected feature value $other")
      }
    }
  }

  /** Reference `_features_for_token` (`crf_extractor.py:513-549`): the ±window
    * feature expansion. Window size = number of configured slots; out-of-range
    * left ⇒ bare `BOS`, right ⇒ bare `EOS` (added once even when several
    * offsets fall outside — dict-key semantics). */
  def featuresForToken(sent: IndexedSeq[CrfToken], tokenIdx: Int,
                       configured: IndexedSeq[IndexedSeq[String]]): Array[FeatAtom] = {
    val windowSize = configured.length
    val half = windowSize / 2
    val out = new scala.collection.mutable.ArrayBuffer[FeatAtom](16)
    var seenBos = false
    var seenEos = false
    var off = -half
    while (off <= half) {
      val pos = tokenIdx + off
      if (pos >= sent.length) {
        if (!seenEos) { out += FeatAtom("EOS", 1.0); seenEos = true }
      } else if (pos < 0) {
        if (!seenBos) { out += FeatAtom("BOS", 1.0); seenBos = true }
      } else {
        slotAtoms(sent(pos), off.toString, configured(off + half), out)
      }
      off += 1
    }
    out.toArray
  }

  /** Reference `_crf_tokens_to_features` (`crf_extractor.py:504-511`). */
  def sentenceFeatures(sent: IndexedSeq[CrfToken],
                       configured: IndexedSeq[IndexedSeq[String]]): IndexedSeq[Array[FeatAtom]] =
    IndexedSeq.tabulate(sent.length)(i => featuresForToken(sent, i, configured))
}
