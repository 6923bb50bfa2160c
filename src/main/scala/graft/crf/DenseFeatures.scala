package graft.crf

/** Word-vector source for the dense-features path — the engine-side analogue
  * of the reference's spaCy vocab vectors (`tokenizer.py:91-98`,
  * `SpacyTokenizer.get_vector`): a token either has a d-dim vector or None
  * (OOV / vectors-less model). */
trait VectorSource extends Serializable {
  def dim: Int
  def vector(word: String): Option[Array[Double]]
}

object VectorSource {

  /** Deterministic pseudo-vectors: every word gets a reproducible vector with
    * components in [−0.5, 0.5), derived from splitmix64 of (word, component).
    * This is the in-container stand-in for a real embedding table (no vector
    * models ship here) — the plumbing (pooling, atom emission, training,
    * decode) is identical with a real source. */
  final case class Hashed(dim: Int, seed: Long = 42L) extends VectorSource {
    def vector(word: String): Option[Array[Double]] = {
      val base = graft.kg.Synth.splitmix64(seed ^ (word.hashCode.toLong * 0x9e3779b97f4a7c15L))
      Some(Array.tabulate(dim) { i =>
        (graft.kg.Synth.splitmix64(base + i) >>> 11).toDouble / (1L << 53).toDouble - 0.5
      })
    }
  }

  /** Fixture-backed vectors (word → vec); absent words are OOV (None), like
    * a real vocabulary. All vectors must share `dim`. */
  final case class Fixture(vecs: Map[String, Array[Double]], dim: Int) extends VectorSource {
    require(vecs.values.forall(_.length == dim), s"all fixture vectors must have dim $dim")
    def vector(word: String): Option[Array[Double]] = vecs.get(word)
  }
}

/** Dense-features pipeline, mirroring reference `features.py:65-94,138-156`:
  * per-token word vectors plus a pooled CLS vector, emitted as crfsuite
  * numeric features `dense_features:text_dense_features:<i>` (the atom format
  * lives in [[Featurizer.slotAtoms]]). */
object DenseFeatures {

  val PoolMean = "mean"
  val PoolMax = "max"

  /** Reference `_calculate_cls_vector` (`features.py:138-156`): pool over the
    * non-zero rows only; all rows zero → a zero vector. */
  def poolCls(features: IndexedSeq[Array[Double]], pooling: String): Array[Double] = {
    require(features.nonEmpty, "poolCls needs at least one vector")
    val d = features.head.length
    val nonZero = features.filter(_.exists(_ != 0.0))
    if (nonZero.isEmpty) return new Array[Double](d)
    pooling match {
      case PoolMean =>
        val out = new Array[Double](d)
        nonZero.foreach { f => var i = 0; while (i < d) { out(i) += f(i); i += 1 } }
        var i = 0
        while (i < d) { out(i) /= nonZero.length; i += 1 }
        out
      case PoolMax =>
        val out = nonZero.head.clone()
        nonZero.tail.foreach { f =>
          var i = 0
          while (i < d) { if (f(i) > out(i)) out(i) = f(i); i += 1 }
        }
        out
      case other => throw new IllegalArgumentException(
        s"Invalid pooling operation specified. Available operations are " +
          s"'$PoolMean' or '$PoolMax', but provided value is '$other'.")
    }
  }

  /** Reference `get_dense_features` (`features.py:65-94`): vectors for the
    * CLS-stripped token sequence plus the pooled CLS row appended — or None
    * when ANY token lacks a vector (the reference's all-or-nothing length
    * check `len(features) != len(tokens) + 1`, which is also what returns
    * None for a vectors-less model). `tokens` is the FULL token list
    * including the CLS sentinel, like the reference message. */
  def getDenseFeatures(tokens: IndexedSeq[Tok], source: VectorSource,
                       pooling: String = PoolMean): Option[IndexedSeq[Array[Double]]] = {
    val toks = Featurizer.tokensWithoutCls(tokens)
    val vecs = toks.flatMap(t => source.vector(t.text))
    if (vecs.isEmpty || vecs.length != toks.length) None
    else Some(vecs :+ poolCls(vecs, pooling))
  }

  /** Dense-aware `Featurizer.__call__` (`features.py:38-63`): CRF tokens with
    * per-token dense vectors attached when the full sequence has them. The
    * pooled CLS row (index len(tokens)) is computed for the length contract
    * but — like the reference — never lands on a CRF token, because tokens
    * are CLS-stripped before the loop. */
  def toCrfTokens(tokens: IndexedSeq[Tok], entities: Option[IndexedSeq[String]],
                  source: VectorSource, pooling: String = PoolMean): IndexedSeq[CrfToken] = {
    val dense = getDenseFeatures(tokens, source, pooling)
    Featurizer.toCrfTokens(tokens, entities).zipWithIndex.map { case (ct, i) =>
      dense match {
        case Some(rows) => ct.copy(dense = rows(i))
        case None       => ct
      }
    }
  }
}
