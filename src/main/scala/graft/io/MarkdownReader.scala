package graft.io

import graft.crf.{Example, Span}
import scala.util.matching.Regex

/** Rasa-style markdown training-data reader — reference
  * `/root/reference/spacy_crfsuite/markdown.py` (regexes at lines 8-14,
  * offset-corrected entity extraction at lines 56-78). */
object MarkdownReader {

  private val ItemRegex: Regex = """\s*[-*+]\s*(.+)""".r
  private val EntRegex: Regex = """\[([^\]]+)\]\(([^:)]*?)(?::([^)]+))?\)""".r
  private val CommentRegex: Regex = """(?m)<!--[\s\S]*?--!*>""".r
  private val HeaderRegex: Regex = """##\s*(.+)?""".r

  def read(text: String, headers: Option[Set[String]] = None): IndexedSeq[Example] = {
    val out = IndexedSeq.newBuilder[Example]
    var currentSection: Option[String] = None
    val stripped = CommentRegex.replaceAllIn(text, "")
    for (line0 <- stripped.linesIterator) {
      val line = line0.trim
      val header = HeaderRegex.findFirstMatchIn(line).map(m => Option(m.group(1)).getOrElse(""))
      if (header.isDefined) currentSection = header
      else if (headers.isEmpty || currentSection.exists(headers.get.contains)) {
        parseItem(line).foreach(out += _)
      }
    }
    out.result()
  }

  /** Reference `parse_item` (`markdown.py:32-41`): anchored item match, entity
    * markup stripped, offsets corrected by the removed markup length. */
  def parseItem(line: String): Option[Example] =
    ItemRegex.findPrefixMatchOf(line).map { m =>
      val example = m.group(1)
      val entities = findEntities(example)
      val plain = EntRegex.replaceAllIn(example, mm => Regex.quoteReplacement(mm.group(1)))
      Example(plain, IndexedSeq.empty, entities)
    }

  /** Reference `find_entities_in_training_example` (`markdown.py:56-78`). */
  def findEntities(example: String): IndexedSeq[Span] = {
    val out = IndexedSeq.newBuilder[Span]
    var offset = 0
    for (m <- EntRegex.findAllMatchIn(example)) {
      val entityText = m.group(1)
      val entityType = m.group(2)
      val value = Option(m.group(3)).getOrElse(entityText)
      val start = m.start - offset
      val end = start + entityText.length
      offset += m.matched.length - entityText.length
      out += Span(start, end, value, entityType, 1.0)
    }
    out.result()
  }
}
