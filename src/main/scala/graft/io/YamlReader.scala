package graft.io

import graft.crf.Example

/** Rasa-NLU YAML training-data reader — reference `read_file` YAML branch
  * (`/root/reference/spacy_crfsuite/utils.py:57-80`): a `nlu:` list whose
  * items carry `examples` either as one markdown block (string) or a list of
  * markdown items; both delegate to the markdown parser.
  *
  * Implemented against the subset of YAML those files actually use (block
  * lists, block scalars `|`, quoted/plain scalars) — Spark ships no YAML
  * parser and the corpus format never nests deeper than `nlu[].examples`. */
object YamlReader {

  def readFile(path: String): IndexedSeq[Example] =
    read(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  def read(content: String): IndexedSeq[Example] = {
    val out = IndexedSeq.newBuilder[Example]
    val lines = content.linesIterator.toIndexedSeq
    var i = 0
    var inNlu = false
    while (i < lines.length) {
      val line = lines(i)
      val trimmed = line.trim
      if (trimmed == "nlu:") { inNlu = true; i += 1 }
      else if (inNlu && trimmed.startsWith("examples:")) {
        val rest = trimmed.stripPrefix("examples:").trim
        if (rest == "|" || rest == "|-" || rest.isEmpty) {
          // block scalar (or a nested list) of markdown items
          val baseIndent = indentOf(line)
          val block = new StringBuilder
          i += 1
          while (i < lines.length && (lines(i).trim.isEmpty || indentOf(lines(i)) > baseIndent)) {
            block.append(lines(i).trim).append('\n')
            i += 1
          }
          block.toString.linesIterator.foreach { item =>
            MarkdownReader.parseItem(item).foreach(out += _)
          }
        } else {
          // inline string: examples: "- foo\n- bar"
          val s = unquote(rest).replace("\\n", "\n")
          s.linesIterator.foreach(item => MarkdownReader.parseItem(item.trim).foreach(out += _))
          i += 1
        }
      } else if (inNlu && !line.startsWith(" ") && trimmed.nonEmpty && !trimmed.startsWith("-") &&
        !trimmed.startsWith("#") && trimmed.endsWith(":") && trimmed != "nlu:") {
        inNlu = false; i += 1 // left the nlu block (new top-level key)
      } else i += 1
    }
    val res = out.result()
    if (res.isEmpty)
      throw new IllegalArgumentException(
        "Can't read examples from YAML. Expecting YAML to have a property for ``nlu``.")
    res
  }

  private def indentOf(s: String): Int = s.takeWhile(_ == ' ').length
  private def unquote(s: String): String =
    if (s.length >= 2 && (s.head == '"' && s.last == '"' || s.head == '\'' && s.last == '\''))
      s.substring(1, s.length - 1)
    else s
}
