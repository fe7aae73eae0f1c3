package graft.query

import org.scalatest.funsuite.AnyFunSuite
import QueryStringParser._

class QueryStringParserSpec extends AnyFunSuite {

  test("precedence: NOT > AND > OR, left associative") {
    assert(parse("a OR b AND c") ==
      Or(Term(None, "a"), And(Term(None, "b"), Term(None, "c"))))
    assert(parse("NOT a AND b") ==
      And(Not(Term(None, "a")), Term(None, "b")))
    assert(parse("a OR b OR c") ==
      Or(Or(Term(None, "a"), Term(None, "b")), Term(None, "c")))
  }

  test("parentheses override precedence") {
    assert(parse("(a OR b) AND c") ==
      And(Or(Term(None, "a"), Term(None, "b")), Term(None, "c")))
  }

  test("field overrides and quoted phrases") {
    assert(parse("lang:de") == Term(Some("lang"), "de"))
    assert(parse("\"two words\"") == Phrase(None, "two words"))
    assert(parse("title:\"a b\" AND x") ==
      And(Phrase(Some("title"), "a b"), Term(None, "x")))
  }

  test("rejects implicit operators, empty input, unbalanced parens") {
    intercept[IllegalArgumentException](parse("a b"))
    intercept[IllegalArgumentException](parse(""))
    intercept[IllegalArgumentException](parse("(a OR b"))
    intercept[IllegalArgumentException](parse("\"open"))
    intercept[IllegalArgumentException](parse("lang:"))
  }
}
