package graft.crf

/** Core data types, mirroring the reference's data model (SURVEY §1.1).
  * All are flat case classes so Spark derives `ExpressionEncoder`s for them —
  * they travel through typed Datasets without custom serialization. */

/** A token with char offsets into its sentence text
  * (reference `Token`, `/root/reference/spacy_crfsuite/tokenizer.py:8-49`). */
case class Tok(text: String, start: Int, end: Int, pos: String, shape: String)

/** A gold or predicted entity span; char offsets into the sentence text
  * (reference entity dict, `crf_extractor.py:384-390`). */
case class Span(start: Int, end: Int, value: String, entity: String, confidence: Double)

/** Featurized token (reference `CRFToken`, `features.py:15-21`).
  * `pattern` is the RegexFeaturizer hook — always empty in the reference's own
  * corpora but part of the feature surface. `dense` is the optional word
  * vector (reference dense_features path, `features.py:65-94`). */
case class CrfToken(
    text: String,
    pos: String,
    entity: String,
    shape: String,
    pattern: Map[String, Boolean] = Map.empty,
    dense: Array[Double] = Array.empty)

/** A training/eval example: raw text plus optional pre-tokenization and gold
  * spans (reference "message" dict). `tokens` non-empty ⇒ pre-tokenized input
  * (CoNLL path) which is consumed as-is — including the reference's
  * drop-last-token quirk (SURVEY §2.4 Q1). */
case class Example(text: String, tokens: IndexedSeq[Tok], entities: IndexedSeq[Span]) {
  def pretokenized: Boolean = tokens.nonEmpty
}

/** Component config (reference defaults at `crf_extractor.py:28-65`).
  * `minFreq` is crfsuite's `min_freq` cut-off (`compat.py:24-28`): state
  * features whose occurrence frequency (value-summed, 1.0 per appearance for
  * the binary features) is no greater than `minFreq` are dropped before
  * training. Besides noise reduction, this is what bounds the driver-side
  * attribute dictionary on web-scale corpora (SparkTrainer collects only the
  * surviving (attr,label) pairs). */
case class CrfConfig(
    bilou: Boolean = true,
    features: IndexedSeq[IndexedSeq[String]] = CrfConfig.defaultFeatures,
    algorithm: String = "lbfgs",
    maxIter: Int = 1000,
    c1: Double = 0.1,
    c2: Double = 0.1,
    allPossibleTransitions: Boolean = true,
    /** crfsuite `all_possible_states` (`compat.py:30-42`): when true, every
      * (attribute, label) pair gets a parameter — negative state features —
      * instead of only observed pairs. Off by default, like crfsuite. */
    allPossibleStates: Boolean = false,
    minFreq: Double = 0.0,
    /** Reference Featurizer cfg (`features.py:30-33`): attach per-token word
      * vectors (+ pooled CLS) as `dense_features` atoms. Needs a
      * [[VectorSource]] passed to the trainer/decoder. */
    useDenseFeatures: Boolean = false,
    denseFeaturesClsPooling: String = "mean")

object CrfConfig {
  /** Reference default feature window (`crf_extractor.py:36-54`). */
  val defaultFeatures: IndexedSeq[IndexedSeq[String]] = IndexedSeq(
    IndexedSeq("low", "title", "upper"),
    IndexedSeq("low", "bias", "prefix5", "prefix2", "suffix5", "suffix3",
      "suffix2", "upper", "title", "digit", "pattern", "shape"),
    IndexedSeq("low", "title", "upper"))

  /** The reference's example config (`examples/default-config.json`). */
  val restaurantConfig: CrfConfig = CrfConfig(
    features = IndexedSeq(
      IndexedSeq("low", "title", "upper"),
      IndexedSeq("low", "bias", "prefix5", "prefix2", "suffix5", "suffix3",
        "suffix2", "upper", "title", "digit"),
      IndexedSeq("low", "title", "upper")),
    c1 = 0.003, c2 = 0.03)
}
