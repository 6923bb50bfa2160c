package graft.io

import org.scalatest.funsuite.AnyFunSuite
import graft.crf.Span

/** Golden tests mirroring the reference's own reader tests
  * (`/root/reference/tests/test_markdown.py`, `tests/test_conll.py`). */
class ReadersSpec extends AnyFunSuite {

  val exampleMd: String =
    """## intent
      |    - what is my balance <!-- no entity -->
      |    - how much do I have on my [savings](source_account) <!-- entity "source_account" has value "savings" -->
      |    - how much do I have on my [savings account](source_account:savings) <!-- synonyms, method 1-->
      |    - Could I pay in [yen](currency)?  <!-- entity matched by lookup table -->""".stripMargin

  test("markdown reader matches reference golden output") {
    val ex = MarkdownReader.read(exampleMd)
    assert(ex.length === 4)
    assert(ex(0).text === "what is my balance")
    assert(ex(0).entities.isEmpty)
    assert(ex(1).text === "how much do I have on my savings")
    assert(ex(1).entities === IndexedSeq(Span(25, 32, "savings", "source_account", 1.0)))
    assert(ex(2).text === "how much do I have on my savings account")
    assert(ex(2).entities === IndexedSeq(Span(25, 40, "savings", "source_account", 1.0)))
    assert(ex(3).text === "Could I pay in yen?")
    assert(ex(3).entities === IndexedSeq(Span(15, 18, "yen", "currency", 1.0)))
  }

  val conll03: String =
    """The DT B-NP O
      |European NNP I-NP B-ORG
      |Commission NNP I-NP I-ORG
      |said VBD B-VP O
      |on IN B-PP O
      |Thursday NNP B-NP O
      |it PRP B-NP O
      |disagreed VBD B-VP O
      |with IN B-PP O
      |German JJ B-NP B-MISC
      |advice NN I-NP O
      |to TO B-PP O
      |consumers NNS B-NP O
      |to TO B-VP O
      |shun VB I-VP O
      |British JJ B-NP B-MISC
      |lamb NN I-NP O
      |until IN B-SBAR O
      |scientists NNS B-NP O
      |determine VBP B-VP O
      |whether IN B-SBAR O
      |mad JJ B-NP O
      |cow NN I-NP O
      |disease NN I-NP O
      |can MD B-VP O
      |be VB I-VP O
      |transmitted VBN I-VP O
      |to TO B-PP O
      |sheep NN B-NP O
      |. . O O""".stripMargin

  test("conll reader matches reference golden output") {
    val ex = ConllReader.readString(conll03).head
    assert(ex.text === ("The European Commission said on Thursday it disagreed with "
      + "German advice to consumers to shun British lamb until scientists "
      + "determine whether mad cow disease can be transmitted to sheep ."))
    assert(ex.tokens(0).text === "The")
    assert(ex.tokens(0).start === 0)
    assert(ex.tokens(0).pos === "DT")
    assert(ex.tokens(1).text === "European")
    assert(ex.tokens(1).start === 4)
    assert(ex.tokens(1).pos === "NNP")
    // every non-O token is a single-token entity keeping its IOB prefix (quirk Q4)
    assert(ex.entities.map(_.entity) === IndexedSeq("B-ORG", "I-ORG", "B-MISC", "B-MISC"))
    assert(ex.entities.map(_.value) === IndexedSeq("European", "Commission", "German", "British"))
  }

  test("conll reader skips -DOCSTART- and comments, splits on blank lines") {
    val s = "-DOCSTART- -X- O O\n\nFoo NNP B-NP B-ORG\nbar NN I-NP O\n\n# comment\nBaz NNP B-NP B-PER\n"
    val exs = ConllReader.readString(s)
    assert(exs.length === 2)
    assert(exs(0).text === "Foo bar")
    assert(exs(1).text === "Baz")
  }
}
