package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** YAML reader: Rasa-NLU layout (`utils.py:57-80`) — both `examples` shapes
  * (markdown block scalar, list of items) must parse like the markdown path. */
class YamlReaderSpec extends AnyFunSuite {

  test("block-scalar examples parse to markdown items") {
    val yml =
      """version: "2.0"
        |nlu:
        |- intent: restaurant_search
        |  examples: |
        |    - show me [chinese](cuisine) restaurants
        |    - anywhere in the [west](location)
        |""".stripMargin
    val ex = YamlReader.read(yml)
    assert(ex.length === 2)
    assert(ex(0).text === "show me chinese restaurants")
    assert(ex(0).entities.head.entity === "cuisine")
    assert(ex(1).entities.head.value === "west")
  }

  test("two intent groups accumulate") {
    val yml =
      """nlu:
        |- intent: a
        |  examples: |
        |    - i want [thai](cuisine)
        |- intent: b
        |  examples: |
        |    - near [rome](location)
        |""".stripMargin
    val ex = YamlReader.read(yml)
    assert(ex.map(_.text) === IndexedSeq("i want thai", "near rome"))
  }

  test("missing nlu key raises like the reference") {
    assertThrows[IllegalArgumentException](YamlReader.read("foo:\n- bar\n"))
  }
}
