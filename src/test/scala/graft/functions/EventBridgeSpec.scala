package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Behavioral contract from /root/reference/tests/MofkaEventbridgeTest.cpp —
 * the full pattern grammar and the example document that must validate.
 */
class EventBridgeSpec extends SparkSpec {
  import spark.implicits._

  // full pattern from the reference test (verbatim semantics)
  val pattern: String =
    """{
      "a1": "a_value",
      "a2": ["a2_value_1", "a2_value_2"],
      "b1": [{"anything-but": "b1_value"}],
      "b2": [{"anything-but": ["b2_value_1", "b2_value_2"]}],
      "b3": [{"anything-but": {"prefix": "b3_prefix"}}],
      "b4": [{"anything-but": {"prefix": ["b4_prefix_1", "b4_prefix_2"]}}],
      "b5": [{"anything-but": {"prefix": {"equals-ignore-case": "b5_prefix" }}}],
      "b6": [{"anything-but": {"prefix": {"equals-ignore-case": ["b6_prefix_1", "b6_prefix_2"] }}}],
      "b7": [{"anything-but": {"suffix": "b7_suffix"}}],
      "b8": [{"anything-but": {"suffix": ["b8_suffix_1", "b8_suffix_2"]}}],
      "b9": [{"anything-but": {"suffix": {"equals-ignore-case": "b9_suffix" }}}],
      "b10": [{"anything-but": {"suffix": {"equals-ignore-case": ["b10_suffix_1", "b10_suffix_2"]}}}],
      "c1": [{"prefix": "c1_prefix"}],
      "c2": [{"prefix": ["c2_prefix_1", "c2_prefix_2"]}],
      "c3": [{"prefix": {"equals-ignore-case": "c3_prefix" }}],
      "c4": [{"prefix": {"equals-ignore-case": ["c4_prefix_1", "c4_prefix_2"] }}],
      "d1": [{"suffix": "d1_suffix"}],
      "d2": [{"suffix": ["d2_suffix_1", "d2_suffix_2"]}],
      "d3": [{"suffix": {"equals-ignore-case": "d3_suffix" }}],
      "d4": [{"suffix": {"equals-ignore-case": ["d4_suffix_1", "d4_suffix_2"]}}],
      "e1": [{"numeric": ["<", 42, ">=", 10]}],
      "e2": [{"numeric": ["<=", 42, ">", 10]}],
      "f1": [{"exists": true}],
      "f2": [{"exists": false}],
      "g1": [{"equals-ignore-case": "g1_VAluE_1"}],
      "g2": [{"equals-ignore-case": ["g2_VAluE_1", "g2_VAluE_2"]}],
      "h1": [{"wildcard": "abc*def*ghi"}],
      "i1": { "i1_1": "i1_1_value" },
      "i2.i2_1": "i2_1_value",
      "j1": [{ "$or": [
          { "j1_1" : [{"exists": true}]},
          { "j2_2" : [{"exists": true}]}
      ]}]
    }"""

  // the document the reference asserts validates successfully
  val example: String =
    """{
      "a1": "a_value", "a2": "a2_value_2",
      "b1": "not_b1_value", "b2": "not_b2_value_1", "b3": "not_b3_prefix_value",
      "b4": "not_b4_prefix_1", "b5": "not_b5_PREfix", "b6": "not_b6_PREfix_1",
      "b7": "b7_suffix_not", "b8": "b8_suffix_1_not", "b9": "b9_SUFfix_not",
      "b10": "b10_SUFfix_1_not",
      "c1": "c1_prefix_value", "c2": "c2_prefix_1_value", "c3": "c3_PREfix_value",
      "c4": "c4_PREfix_1_value",
      "d1": "value_d1_suffix", "d2": "value_d2_suffix_2", "d3": "value_d3_SUFfix",
      "d4": "value_d4_SUFfix_2",
      "e1": 33, "e2": 34,
      "f1": "something",
      "g1": "g1_vaLUe_1", "g2": "g2_vaLUe_2",
      "h1": "abcXXXdefYYghi",
      "i1": { "i1_1": "i1_1_value" },
      "i2": { "i2_1": "i2_1_value" },
      "j1": { "j2_2": 123 }
    }"""

  private def matches(pat: String, doc: String): Boolean = {
    val df = Seq(doc).toDF("md")
    df.filter(EventBridge.compile(pat, col("md"))).count() == 1
  }

  private def matchesFast(pat: String, doc: String): Boolean =
    EventBridge.filterFast(Seq(doc).toDF("md"), "md", pat).count() == 1

  test("reference example document validates against the full pattern") {
    assert(matches(pattern, example))
  }

  test("single-parse struct path agrees with the per-field path") {
    assert(matchesFast(pattern, example))
    assert(!matchesFast(pattern, example.replace("\"a1\": \"a_value\"", "\"a1\": \"wrong\"")))
    // grammar features through the struct resolver
    assert(matchesFast("""{"i1.i1_1": "v"}""", """{"i1": {"i1_1": "v"}}"""))
    assert(matchesFast("""{"e": [{"numeric": ["<", 42, ">=", 10]}]}""", """{"e": 10}"""))
    assert(!matchesFast("""{"f": [{"exists": true}]}""", """{"g": 1}"""))
  }

  test("schemaFor derives the minimal nested read schema") {
    val s = EventBridge.schemaFor("""{"a": 1, "i1": {"i1_1": "v"}, "i2.i2_1": "w"}""")
    assert(s.fieldNames.toSet == Set("a", "i1", "i2"))
    assert(s("i1").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("i1_1"))
    // leaf/object conflicts are rejected toward the safe path
    intercept[IllegalArgumentException] {
      EventBridge.schemaFor("""{"a": 1, "a.b": 2}""")
    }
  }

  test("exact value mismatch rejects") {
    assert(!matches(pattern, example.replace("\"a1\": \"a_value\"", "\"a1\": \"wrong\"")))
  }

  test("numeric range boundaries") {
    assert(matches("""{"e": [{"numeric": ["<", 42, ">=", 10]}]}""", """{"e": 10}"""))
    assert(!matches("""{"e": [{"numeric": ["<", 42, ">=", 10]}]}""", """{"e": 42}"""))
    assert(matches("""{"e": [{"numeric": ["<=", 42]}]}""", """{"e": 42}"""))
    assert(!matches("""{"e": [{"numeric": [">", 10]}]}""", """{"e": "nan_string"}"""))
  }

  test("exists true/false") {
    assert(matches("""{"f": [{"exists": true}]}""", """{"f": 1}"""))
    assert(!matches("""{"f": [{"exists": true}]}""", """{"g": 1}"""))
    assert(matches("""{"f": [{"exists": false}]}""", """{"g": 1}"""))
  }

  test("wildcard is anchored and multi-segment") {
    assert(matches("""{"h": [{"wildcard": "abc*def*ghi"}]}""", """{"h": "abcdefghi"}"""))
    assert(!matches("""{"h": [{"wildcard": "abc*def*ghi"}]}""", """{"h": "Xabcdefghi"}"""))
    assert(!matches("""{"h": [{"wildcard": "abc*def*ghi"}]}""", """{"h": "abcdefghiX"}"""))
    // regex metacharacters in the literal parts must be quoted
    assert(matches("""{"h": [{"wildcard": "a.c*z"}]}""", """{"h": "a.cXYZz"}"""))
    assert(!matches("""{"h": [{"wildcard": "a.c*z"}]}""", """{"h": "abcXYZz"}"""))
  }

  test("anything-but requires presence") {
    assert(!matches("""{"b": [{"anything-but": "x"}]}""", """{"other": 1}"""))
    assert(matches("""{"b": [{"anything-but": "x"}]}""", """{"b": "y"}"""))
    assert(!matches("""{"b": [{"anything-but": "x"}]}""", """{"b": "x"}"""))
  }

  test("$or across sub-patterns") {
    val p = """{"j1": [{"$or": [{"a": [{"exists": true}]}, {"b": [{"exists": true}]}]}]}"""
    assert(matches(p, """{"j1": {"b": 2}}"""))
    assert(!matches(p, """{"j1": {"c": 2}}"""))
  }

  test("nested object and dotted path are equivalent") {
    assert(matches("""{"i1": {"i1_1": "v"}}""", """{"i1": {"i1_1": "v"}}"""))
    assert(matches("""{"i1.i1_1": "v"}""", """{"i1": {"i1_1": "v"}}"""))
    assert(!matches("""{"i1.i1_1": "v"}""", """{"i1": {"i1_1": "w"}}"""))
  }

  test("numeric exact match tolerates int/float text forms") {
    assert(matches("""{"e": 42}""", """{"e": 42.0}"""))
    assert(matches("""{"e": 42}""", """{"e": 42}"""))
    assert(!matches("""{"e": 42}""", """{"e": "42x"}"""))
  }

  test("documented divergences vs AWS: text-typed exact match, arrays opaque") {
    // numeric pattern matches the string form of the number (type erased)
    assert(matches("""{"e": 42}""", """{"e": "42"}"""))
    assert(matches("""{"b": true}""", """{"b": "true"}"""))
    // array-valued fields never match scalar matchers (AWS is element-wise)
    assert(!matches("""{"a": "x"}""", """{"a": ["x", "y"]}"""))
  }

  test("boolean and list-of-values") {
    assert(matches("""{"b": true}""", """{"b": true}"""))
    assert(!matches("""{"b": true}""", """{"b": false}"""))
    assert(matches("""{"a": ["x", "y"]}""", """{"a": "y"}"""))
    assert(!matches("""{"a": ["x", "y"]}""", """{"a": "z"}"""))
  }
}
