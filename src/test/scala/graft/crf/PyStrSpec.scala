package graft.crf

import org.scalatest.funsuite.AnyFunSuite
import graft.text.{PyStr, Shape}

/** Table tests for Python string-semantics parity (SURVEY §7 hard parts).
  * Expected values computed with CPython's str methods. */
class PyStrSpec extends AnyFunSuite {

  test("istitle matches CPython") {
    val cases = Seq(
      "The" -> true, "THE" -> false, "the" -> false, "T" -> true, "t" -> false,
      "McDonald" -> false, "Mc Donald" -> true, "123" -> false, "A1" -> true,
      "A1a" -> false, "1A" -> true, "1a" -> false, "" -> false, "." -> false,
      "U.S." -> true, "U.S.A" -> true, "Don't" -> false, "Don'T" -> true,
      "Hello World" -> true, "Hello world" -> false, "-Hello-" -> true)
    for ((s, want) <- cases) assert(PyStr.istitle(s) === want, s"istitle($s)")
  }

  test("isupper matches CPython") {
    val cases = Seq(
      "THE" -> true, "The" -> false, "the" -> false, "T" -> true,
      "123" -> false, "A1" -> true, "1A" -> true, "" -> false,
      "U.S." -> true, "ABC-DEF" -> true, "ABc" -> false, "." -> false)
    for ((s, want) <- cases) assert(PyStr.isupper(s) === want, s"isupper($s)")
  }

  test("isdigit matches CPython on BMP digits") {
    val cases = Seq(
      "123" -> true, "0" -> true, "" -> false, "12a" -> false, "1.5" -> false,
      "-1" -> false, "١٢٣" -> true /* Arabic-Indic digits, Nd */)
    for ((s, want) <- cases) assert(PyStr.isdigit(s) === want, s"isdigit($s)")
  }

  test("prefix/suffix slicing is safe on short strings") {
    assert(PyStr.prefix("ab", 5) === "ab")
    assert(PyStr.prefix("abcdef", 5) === "abcde")
    assert(PyStr.suffix("ab", 5) === "ab")
    assert(PyStr.suffix("abcdef", 3) === "def")
    assert(PyStr.suffix("", 1) === "")
  }

  test("shape matches spaCy word_shape") {
    assert(Shape.of("Apple") === "Xxxxx")
    assert(Shape.of("YELLING") === "XXXX")          // run of X capped at 4
    assert(Shape.of("apple123") === "xxxxddd")      // run of x capped at 4
    assert(Shape.of("don't") === "xxx'x")
    assert(Shape.of("12.50") === "dd.dd")
    assert(Shape.of("U.S.") === "X.X.")
  }
}
