package graft.finance.serving

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** The request/response JSON layer's deterministic cases: writer escaping,
  * parser structure, and the malformed-body failure modes the routes map
  * to 422. The round-trip laws live in [[ApiJsonCheck]]. */
class ApiJsonSpec extends AnyFunSuite {

  private val ctrl = 1.toChar // a sub-0x20 char, forced through \uXXXX output

  test("writer escapes control characters, quotes, and backslashes") {
    assert(ApiJson.str("a\"b\\c\nd\te" + ctrl + "f")
      == "\"a\\\"b\\\\c\\nd\\te\\u0001f\"")
    assert(ApiJson.value(null) == "null")
    assert(ApiJson.value(Double.NaN) == "null") // NaN is not JSON
  }

  test("parser handles nesting, escapes, numbers, and whitespace") {
    val v = ApiJson.parse("""{ "a": [1, -2.5e1, "x\ny"], "b": {"c": true}, "d": null }""")
    val m = v.asInstanceOf[Map[String, Any]]
    assert(m("a") == List(1.0, -25.0, "x\ny"))
    assert(m("b") == Map("c" -> true))
    assert(m("d") == null)
  }

  test("malformed bodies raise ParseError, never mis-parse") {
    for (bad <- Seq("{nope", "[1,", "\"unterminated", "{\"a\" 1}", "tru",
        "{\"a\":1} extra", "", "{\"a\":1,}")) {
      intercept[ApiJson.ParseError] { ApiJson.parse(bad) }
    }
  }
}

/** Round-trip laws for the hand-rolled JSON layer — a parser the serving
  * boundary trusts with raw request bytes earns a fuzzing pass. */
object ApiJsonCheck extends Properties("graft.finance.serving.ApiJson") {

  private val ctrl = 1.toChar

  private val jsonString: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar,
      Gen.oneOf('"', '\\', '\n', '\t', ctrl, 'é')))
      .map(_.mkString)

  property("write-then-parse round-trips strings exactly") =
    forAll(jsonString) { s =>
      ApiJson.parse(ApiJson.str(s)) == s
    }

  property("write-then-parse round-trips flat string maps") =
    forAll(Gen.mapOf(Gen.zip(jsonString, jsonString))) { m =>
      val json = ApiJson.obj(m.toSeq.map { case (k, v) => k -> ApiJson.str(v) })
      ApiJson.parse(json) == m
    }

  property("finite doubles round-trip through the writer") =
    forAll { (d: Double) =>
      Prop.iff[Double](d, {
        case v if v.isNaN || v.isInfinite => Prop.passed
        case v => Prop(ApiJson.parse(ApiJson.value(v)) == v)
      })
    }
}
