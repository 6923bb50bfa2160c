package graft.text

import graft.crf.Tok

/** Deterministic rule tokenizer for free text, standing in for the reference's
  * spaCy tokenizer (`/root/reference/spacy_crfsuite/tokenizer.py:61-98`).
  *
  * spaCy itself is not reproducible on the JVM; the parity corpora (CoNLL
  * fixtures) are pre-tokenized and bypass this entirely, so this only has to be
  * deterministic and produce tokens whose (start, end) offsets index the
  * original text exactly — the invariant every downstream stage depends on.
  *
  * Rules (spaCy-like): split on whitespace; peel leading/trailing punctuation
  * one char at a time; split common English contractions ('s, 'm, 're, 've,
  * 'll, 'd, n't) as their own tokens. Like the reference tokenizer it appends
  * a `__CLS__` sentinel at `lastEnd + 1` (`tokenizer.py:85-88`) which all
  * consumers drop again (`features.py:127-129`) — quirk Q1 in SURVEY §2.4.
  */
object RuleTokenizer {

  private val ContractionSuffixes = Array("n't", "'s", "'m", "'re", "'ve", "'ll", "'d",
    "N'T", "'S", "'M", "'RE", "'VE", "'LL", "'D")

  private def isPunct(c: Char): Boolean =
    !Character.isLetterOrDigit(c) && !Character.isWhitespace(c)

  /** Tokenize and append the CLS sentinel (reference `tokenize`). */
  def tokenizeWithCls(text: String): IndexedSeq[Tok] = {
    val toks = tokenize(text)
    if (toks.isEmpty) toks
    else {
      val idx = toks.last.end + 1
      toks :+ Tok("__CLS__", idx, idx + "__CLS__".length, "", Shape.of("__CLS__"))
    }
  }

  /** Raw tokens, no CLS. Offsets are char offsets into `text`. */
  def tokenize(text: String): IndexedSeq[Tok] = {
    val out = IndexedSeq.newBuilder[Tok]
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      if (i < n) {
        var j = i
        while (j < n && !Character.isWhitespace(text.charAt(j))) j += 1
        emitChunk(text, i, j, out)
        i = j
      }
    }
    out.result()
  }

  private def emitChunk(text: String, start: Int, end: Int,
                        out: scala.collection.mutable.Builder[Tok, IndexedSeq[Tok]]): Unit = {
    var s = start
    var e = end
    // leading punctuation, one char each
    while (s < e && isPunct(text.charAt(s)) && e - s > 1) {
      out += mk(text, s, s + 1); s += 1
    }
    // trailing punctuation, collected then emitted after the core
    var trail = List.empty[(Int, Int)]
    while (e > s + 1 && isPunct(text.charAt(e - 1))) {
      trail = (e - 1, e) :: trail; e -= 1
    }
    if (s < e) {
      val core = text.substring(s, e)
      val suf = ContractionSuffixes.find(cs => core.length > cs.length && core.endsWith(cs))
      suf match {
        case Some(cs) =>
          out += mk(text, s, e - cs.length)
          out += mk(text, e - cs.length, e)
        case None =>
          out += mk(text, s, e)
      }
    }
    trail.foreach { case (a, b) => out += mk(text, a, b) }
  }

  private def mk(text: String, s: Int, e: Int): Tok = {
    val t = text.substring(s, e)
    Tok(t, s, e, "", Shape.of(t))
  }
}
