package graft.crf

/** BILOU tag arithmetic (reference `/root/reference/spacy_crfsuite/bilou.py`). */
object Bilou {
  val NoEntityTag = "O"
  private val Prefixes = Set("B-", "I-", "U-", "L-")

  /** `bilou_prefix_from_tag` (`bilou.py:25-35`). */
  def prefixOf(tag: String): Option[Char] =
    if (tag.length >= 2 && Prefixes.contains(tag.substring(0, 2))) Some(tag.charAt(0)) else None

  /** `entity_name_from_tag` (`bilou.py:38-48`). */
  def entityName(tag: String): String =
    if (tag.length >= 2 && Prefixes.contains(tag.substring(0, 2))) tag.substring(2) else tag

  /** `remove_bilou_prefixes` (`bilou.py:96-99`) — used for the CoNLL
    * `bilou=False` round-trip (quirk Q4, SURVEY §2.4). */
  def removePrefixes(tags: IndexedSeq[String]): IndexedSeq[String] = tags.map(entityName)

  /** `bilou_tags_from_offsets` (`bilou.py:52-93`): gold char spans → BILOU tags
    * via exact start/end offset match; entities not aligned to token
    * boundaries are silently dropped (quirk Q5). Later entities overwrite
    * earlier ones on overlap, as in the reference's in-place writes. */
  def tagsFromOffsets(tokens: IndexedSeq[Tok], entities: Seq[(Int, Int, String)]): IndexedSeq[String] = {
    val startTo = tokens.iterator.zipWithIndex.map { case (t, i) => t.start -> i }.toMap
    val endTo = tokens.iterator.zipWithIndex.map { case (t, i) => t.end -> i }.toMap
    val bilou = Array.fill(tokens.length)(NoEntityTag)
    for ((startPos, endPos, label) <- entities) {
      (startTo.get(startPos), endTo.get(endPos)) match {
        case (Some(s), Some(e)) =>
          if (s == e) bilou(s) = s"U-$label"
          else {
            bilou(s) = s"B-$label"
            var i = s + 1
            while (i < e) { bilou(i) = s"I-$label"; i += 1 }
            bilou(e) = s"L-$label"
          }
        case _ => // misaligned → dropped (bilou.py:86 "Only interested if the tokenization is correct")
      }
    }
    bilou.toIndexedSeq
  }
}
