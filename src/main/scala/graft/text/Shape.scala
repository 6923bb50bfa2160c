package graft.text

/** Word-shape feature, matching spaCy's `word_shape` (the producer of
  * `token.shape_` that the reference consumes at
  * `/root/reference/spacy_crfsuite/tokenizer.py:77` and featurizes via
  * `crf_extractor.py:81`): alpha→x/X, digit→d, other chars kept verbatim,
  * runs longer than 4 of the same shape char are truncated to 4;
  * strings of length ≥ 100 collapse to "LONG". */
object Shape {
  def of(text: String): String = {
    if (text.codePointCount(0, text.length) >= 100) return "LONG"
    val sb = new StringBuilder
    var last = -1
    var seq = 0
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val shapeCp =
        if (Character.isLetter(cp)) { if (Character.isUpperCase(cp) || Character.isTitleCase(cp)) 'X'.toInt else 'x'.toInt }
        else if (Character.isDigit(cp)) 'd'.toInt
        else cp
      if (shapeCp == last) seq += 1
      else { seq = 0; last = shapeCp }
      if (seq < 4) sb.appendAll(Character.toChars(shapeCp))
      i += Character.charCount(cp)
    }
    sb.result()
  }
}
