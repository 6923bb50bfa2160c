package graft.io

import graft.crf.{Example, Span, Tok}

/** CoNLL-02/03 reader — reference `/root/reference/spacy_crfsuite/conll.py`.
  *
  * Per block (`_parse_block`, `conll.py:47-85`): 3 columns = (word, pos, tag),
  * 4 columns = (word, pos, chunk, tag); running char offsets `idx += len+1`;
  * `text` = words joined by single spaces (byte-identical per-row invariant);
  * every non-O token becomes its own single-token entity whose entity NAME
  * keeps its IOB prefix (quirk Q4, SURVEY §2.4). Tokens carry pos but no
  * shape, and no CLS sentinel is appended — so the downstream drop-last-token
  * quirk (Q1) removes the final real token, as in the reference. */
object ConllReader {

  def readFile(path: String): IndexedSeq[Example] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  def readString(content: String): IndexedSeq[Example] = parse(content.linesIterator)

  def parse(lines: Iterator[String]): IndexedSeq[Example] = {
    val out = IndexedSeq.newBuilder[Example]
    val buf = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    def flush(): Unit = if (buf.nonEmpty) { out += parseBlock(buf.toIndexedSeq); buf.clear() }
    for (line <- lines) {
      if (line.isEmpty) flush()
      else if (line.startsWith("-DOCSTART-") || line.startsWith("#")) ()
      else buf += line.split("\\s+").filter(_.nonEmpty)
    }
    flush()
    out.result()
  }

  def parseBlock(buff: IndexedSeq[Array[String]]): Example = {
    val tokens = IndexedSeq.newBuilder[Tok]
    val entities = IndexedSeq.newBuilder[Span]
    var idx = 0
    for (pieces <- buff) {
      val (word, pos, tag) = pieces.length match {
        case 3 => (pieces(0), pieces(1), pieces(2))
        case 4 => (pieces(0), pieces(1), pieces(3))
        case _ => throw new IllegalArgumentException(s"Could not parse: ${pieces.mkString(" ")}")
      }
      val tok = Tok(word, idx, idx + word.length, pos, null)
      tokens += tok
      idx += word.length + 1
      if (tag != graft.crf.Bilou.NoEntityTag)
        entities += Span(tok.start, tok.end, tok.text, tag, 1.0)
    }
    val toks = tokens.result()
    Example(toks.map(_.text).mkString(" "), toks, entities.result())
  }
}
