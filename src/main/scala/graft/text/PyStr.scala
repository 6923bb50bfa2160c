package graft.text

/** Python string-semantics ports (bit-exact where the reference relies on them).
  *
  * The reference's feature functions call Python's `str.istitle()`,
  * `str.isupper()`, `str.isdigit()`, `str.lower()` and slicing
  * (`/root/reference/spacy_crfsuite/crf_extractor.py:67-84`). Java's
  * `Character`/`String` methods differ at the edges (titlecase chars, uncased
  * scripts, slice bounds), so we port the CPython definitions directly.
  */
object PyStr {

  @inline private def isCased(cp: Int): Boolean =
    Character.isUpperCase(cp) || Character.isLowerCase(cp) || Character.isTitleCase(cp)

  /** CPython `str.istitle()`: at least one cased char; uppercase/titlecase chars
    * may only follow uncased chars; lowercase chars may only follow cased chars. */
  def istitle(s: String): Boolean = {
    var cased = false
    var prevCased = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (Character.isUpperCase(cp) || Character.isTitleCase(cp)) {
        if (prevCased) return false
        prevCased = true
        cased = true
      } else if (Character.isLowerCase(cp)) {
        if (!prevCased) return false
        prevCased = true
        cased = true
      } else {
        prevCased = false
      }
      i += Character.charCount(cp)
    }
    cased
  }

  /** CPython `str.isupper()`: no lowercase cased chars, at least one cased char. */
  def isupper(s: String): Boolean = {
    var cased = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (Character.isLowerCase(cp)) return false
      if (Character.isUpperCase(cp) || Character.isTitleCase(cp)) cased = true
      i += Character.charCount(cp)
    }
    cased
  }

  /** CPython `str.isdigit()`: non-empty and every char has the digit property.
    * `Character.isDigit` covers Unicode Nd; Python additionally accepts a few
    * No-category digit chars (superscripts) — irrelevant for the reference's
    * ASCII CoNLL/markdown fixtures, accepted deviation. */
  def isdigit(s: String): Boolean = {
    if (s.isEmpty) return false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (!Character.isDigit(cp)) return false
      i += Character.charCount(cp)
    }
    true
  }

  /** Python `str.lower()` — locale-independent full lowercase. */
  def lower(s: String): String = s.toLowerCase(java.util.Locale.ROOT)

  /** Python `s[:n]` on code points, safe for short strings. */
  def prefix(s: String, n: Int): String = {
    val cps = s.codePointCount(0, s.length)
    if (cps <= n) s else s.substring(0, s.offsetByCodePoints(0, n))
  }

  /** Python `s[-n:]` on code points, safe for short strings. */
  def suffix(s: String, n: Int): String = {
    val cps = s.codePointCount(0, s.length)
    if (cps <= n) s else s.substring(s.offsetByCodePoints(0, cps - n))
  }
}
