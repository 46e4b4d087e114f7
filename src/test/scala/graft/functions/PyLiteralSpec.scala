package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class PyLiteralSpec extends AnyFunSuite {

  test("list of dicts, single quotes") {
    assert(PyLiteral.toJson("[{'id': 'ou_abc123', 'name': 'Nguyen Van A'}]") ===
      """[{"id":"ou_abc123","name":"Nguyen Van A"}]""")
  }

  test("bare dict (payment buying person shape)") {
    assert(PyLiteral.toJson("{'id': 'ou_x', 'name': 'B'}") ===
      """{"id":"ou_x","name":"B"}""")
  }

  test("list of strings (department_ids)") {
    assert(PyLiteral.toJson("['od_1', 'od_2']") === """["od_1","od_2"]""")
  }

  test("None / True / False / numbers") {
    assert(PyLiteral.toJson("[None, True, False, 42, -1.5, 1e3]") ===
      """[null,true,false,42,-1.5,1e3]""")
  }

  test("text payload with numeric value") {
    assert(PyLiteral.toJson("[{'text': 50000}]") === """[{"text":50000}]""")
  }

  test("escaped single quote inside string") {
    assert(PyLiteral.toJson("""['it\'s']""") === """["it's"]""")
  }

  test("double quote inside single-quoted string is JSON-escaped") {
    assert(PyLiteral.toJson("['say \"hi\"']") === """["say \"hi\""]""")
  }

  test("tuple becomes array") {
    assert(PyLiteral.toJson("('a', 'b')") === """["a","b"]""")
  }

  test("trailing comma tolerated") {
    assert(PyLiteral.toJson("['a', 'b',]") === """["a","b"]""")
  }

  test("nested structures") {
    assert(PyLiteral.toJson("{'a': [{'b': None}], 'c': {'d': 1}}") ===
      """{"a":[{"b":null}],"c":{"d":1}}""")
  }

  test("numeric dict keys are quoted") {
    assert(PyLiteral.toJson("{1: 'x'}") === """{"1":"x"}""")
  }

  test("garbage returns null") {
    assert(PyLiteral.toJson("not a literal") === null)
    assert(PyLiteral.toJson("[unclosed") === null)
    assert(PyLiteral.toJson("") === null)
    assert(PyLiteral.toJson(null) === null)
  }

  test("trailing junk rejected") {
    assert(PyLiteral.toJson("[1] extra") === null)
  }
}
