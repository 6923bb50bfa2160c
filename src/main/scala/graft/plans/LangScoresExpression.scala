package graft.plans

import java.util.Locale

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `lang_scores(text)` as a native Catalyst expression: one imperative pass
  * over the normalized text that extracts DISTINCT char trigrams and
  * accumulates an idf-weighted overlap score per language profile — a
  * trigram present in k of the L profiles contributes integer weight L−k
  * (normalized to [0,1] by (L−1)·n in `LangId.score`), so language-unique
  * trigrams dominate and pan-European ones (" de", "es ")
  * weigh 0. Weighted overlap separates related languages (es/pt, de/nl) far
  * better than the discriminative-set count it replaces: shared-but-skewed
  * trigrams keep partial signal instead of being dropped.
  *
  * Per-row the kernel is a single substring loop with ONE global HashMap
  * probe per distinct trigram (language membership packed in a Long bitmask,
  * weight derived from its popcount) — the previous higher-order-function
  * formulation walked a 64+-element char array through three interpreted
  * lambda layers per row (~10× more per-row work, measured in BENCH q26).
  *
  * `doGenCode` emits a direct call to the kernel (the expression instance is
  * a codegen reference object) — round 2 used CodegenFallback, which routed
  * every row through an interpreted `Expression.eval` hop with boxing.
  *
  * Returns struct<lang: string, scores: array<double>, n_trigrams: int> with
  * `scores` aligned to the constructor's `langs` order; argmax ties break to
  * the later (lexicographically last) language; empty text → lang "".
  */
case class LangScoresExpression(child: Expression, langs: Seq[String],
                                profiles: Seq[Seq[String]])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes = Seq(StringType)


  require(langs.length == profiles.length, "one profile per language")
  require(langs.length >= 2 && langs.length <= 64, "2..64 language profiles")
  // the documented tie-break ("lexicographically last language wins") is
  // really "last constructor index wins" — enforce sorted langs so the two
  // coincide and the generated DuckDB oracle's ORDER BY lang DESC matches
  require(langs == langs.sorted, s"langs must be sorted, got $langs")

  override def dataType: DataType = LangScoresExpression.scoresType
  override def nullable: Boolean = true
  override def prettyName: String = "lang_scores"

  /** trigram → bitmask of the profiles containing it. */
  @transient private lazy val masks: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    profiles.zipWithIndex.foreach { case (p, l) =>
      p.foreach { g =>
        val prev = m.get(g)
        m.put(g, (if (prev == null) 0L else prev.longValue()) | (1L << l))
      }
    }
    m
  }

  override def nullSafeEval(input: Any): Any = evalText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langScores", this, classOf[LangScoresExpression].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalText($c);")
  }

  /** The kernel — public so the generated code can call it directly. */
  def evalText(input: UTF8String): InternalRow = {
    val raw = input.toString
    val t = " " + LangScoresExpression.Ws.matcher(raw.toLowerCase(Locale.ROOT)).replaceAll(" ") + " "
    val nLangs = langs.length
    // presize for the common short-document case but cap: a multi-MB text
    // must not allocate a multi-MB bucket table per row (the set grows on
    // demand; distinct trigrams saturate far below text length anyway)
    val seen = new java.util.HashSet[String](math.min(math.max(16, t.length * 2), 1 << 16))
    val scores = new Array[Double](nLangs)
    // trigrams are CODE-POINT windows, not UTF-16 code units: the DuckDB
    // oracle slices characters, and a supplementary-plane char (emoji, rare
    // CJK) must not split surrogate pairs. The all-BMP fast path (the
    // overwhelming web-text case) keeps the original zero-alloc indexing.
    val cps: Array[Int] =
      if (t.length == t.codePointCount(0, t.length)) null
      else t.codePoints().toArray
    val nCp = if (cps == null) t.length else cps.length
    var i = 0
    val last = nCp - 3
    while (i <= last) {
      val g = if (cps == null) t.substring(i, i + 3) else new String(cps, i, 3)
      if (seen.add(g)) {
        val mask = masks.get(g)
        if (mask != null) {
          var m = mask.longValue()
          // INTEGER weight (L − df): keeps every accumulated score exactly
          // representable, so the DuckDB oracle (integer sums, one final
          // division) reproduces the doubles bit-for-bit. Normalization by
          // (L − 1) happens once in LangId.score; argmax is scale-invariant.
          val w = (nLangs - java.lang.Long.bitCount(m)).toDouble
          while (m != 0L) {
            val l = java.lang.Long.numberOfTrailingZeros(m)
            scores(l) += w
            m &= m - 1
          }
        }
      }
      i += 1
    }
    val lang =
      if (seen.isEmpty) ""
      else {
        var best = 0
        var l = 1
        while (l < nLangs) {
          if (scores(l) >= scores(best)) best = l
          l += 1
        }
        langs(best)
      }
    InternalRow(UTF8String.fromString(lang), new GenericArrayData(scores), seen.size)
  }

  override protected def withNewChildInternal(newChild: Expression): LangScoresExpression =
    copy(child = newChild)
}

object LangScoresExpression {
  /** RE2-equivalent whitespace class (matches the DuckDB oracle's regex),
    * precompiled once — String.replaceAll recompiled it per row. */
  private[plans] val Ws: java.util.regex.Pattern =
    java.util.regex.Pattern.compile("[ \\t\\n\\f\\r]+")

  val scoresType: DataType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("scores", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("n_trigrams", IntegerType, nullable = false)))
}
