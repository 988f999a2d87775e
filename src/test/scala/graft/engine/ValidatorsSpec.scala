package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * JSON-Schema validator keyword matrix (F2): accept/reject per keyword.
 * The reference delegates to a full JSON-Schema engine
 * (`/root/reference/src/JsonUtil.hpp:182-224`); this pins the subset the
 * Spark predicate implements — type/properties/required/items plus enum,
 * minimum/maximum, pattern, additionalProperties.
 */
class ValidatorsSpec extends SparkSpec {

  /** Evaluate the validator predicate over a batch of metadata docs. */
  private def accepted(schema: String, docs: Seq[String]): Seq[Boolean] = {
    import spark.implicits._
    val v = Validator.SchemaValidator(schema)
    docs.toDF("metadata")
      .select(coalesce(v.predicate(col("metadata")), lit(false)).as("ok"))
      .collect().map(_.getBoolean(0)).toSeq
  }

  private def check(schema: String, cases: (String, Boolean)*): Unit = {
    val got = accepted(schema, cases.map(_._1))
    cases.zip(got).foreach { case ((doc, want), is) =>
      assert(is == want, s"doc $doc: expected ${if (want) "accept" else "reject"}")
    }
  }

  test("enum: string membership") {
    check(
      """{"type":"object","properties":{"state":{"type":"string","enum":["open","closed"]}}}""",
      """{"state":"open"}""" -> true,
      """{"state":"closed"}""" -> true,
      """{"state":"pending"}""" -> false,
      """{}""" -> true) // absent property passes; presence is `required`'s job
  }

  test("enum: integer membership") {
    check(
      """{"type":"object","properties":{"prio":{"type":"integer","enum":[1,2,3]}}}""",
      """{"prio":2}""" -> true,
      """{"prio":7}""" -> false)
  }

  test("minimum/maximum bound numbers inclusively") {
    val schema =
      """{"type":"object","properties":{"pct":{"type":"number","minimum":0,"maximum":100}}}"""
    check(schema,
      """{"pct":0}""" -> true,
      """{"pct":100}""" -> true,
      """{"pct":55.5}""" -> true,
      """{"pct":-1}""" -> false,
      """{"pct":100.01}""" -> false,
      """{}""" -> true)
  }

  test("pattern is an unanchored regex search, like the JSON-Schema spec") {
    val schema =
      """{"type":"object","properties":{"id":{"type":"string","pattern":"^[A-Z]{2}-[0-9]+$"},
        |                               "note":{"type":"string","pattern":"urgent"}}}""".stripMargin
    check(schema,
      """{"id":"AB-123"}""" -> true,
      """{"id":"ab-123"}""" -> false,
      """{"id":"AB-123-extra"}""" -> false,
      """{"note":"this is urgent indeed"}""" -> true, // substring match
      """{"note":"calm"}""" -> false)
  }

  test("additionalProperties:false rejects unexpected keys, root and nested") {
    val schema =
      """{"type":"object","additionalProperties":false,
        | "properties":{"name":{"type":"string"},
        |               "geo":{"type":"object","additionalProperties":false,
        |                      "properties":{"lat":{"type":"number"},"lon":{"type":"number"}}}}}""".stripMargin
    check(schema,
      """{"name":"a"}""" -> true,
      """{"name":"a","geo":{"lat":1.0,"lon":2.0}}""" -> true,
      """{"name":"a","extra":1}""" -> false,
      """{"name":"a","geo":{"lat":1.0,"alt":3.0}}""" -> false)
  }

  test("items: scalar keywords apply to every array element") {
    val schema =
      """{"type":"object","properties":{
        |  "scores":{"type":"array","items":{"type":"integer","minimum":0,"maximum":10}},
        |  "tags":{"type":"array","items":{"type":"string","pattern":"^[a-z]+$"}}}}""".stripMargin
    check(schema,
      """{"scores":[0,5,10]}""" -> true,
      """{"scores":[3,-1]}""" -> false,
      """{"scores":[3,11]}""" -> false,
      """{"scores":[]}""" -> true,
      """{"tags":["ab","cd"]}""" -> true,
      """{"tags":["ab","CD"]}""" -> false,
      """{}""" -> true)
  }

  test("required on nested objects; absent nested object still passes") {
    val schema =
      """{"type":"object","properties":{
        |  "geo":{"type":"object","required":["lat"],
        |         "properties":{"lat":{"type":"number"},"lon":{"type":"number"}}}}}""".stripMargin
    check(schema,
      """{"geo":{"lat":1.5}}""" -> true,
      """{"geo":{"lon":2.5}}""" -> false, // nested required fails
      """{}""" -> true) // geo itself is not required
  }

  test("keywords compose with required and type parsing") {
    val schema =
      """{"type":"object","required":["kind","n"],
        | "properties":{"kind":{"type":"string","enum":["a","b"]},
        |               "n":{"type":"integer","minimum":10}}}""".stripMargin
    check(schema,
      """{"kind":"a","n":10}""" -> true,
      """{"kind":"c","n":10}""" -> false, // enum fails
      """{"kind":"a","n":9}""" -> false,  // minimum fails
      """{"kind":"a"}""" -> false,        // required fails
      """not json""" -> false)            // parse fails
  }

  test("produce-time integration: constraint violation aborts the batch") {
    val d = new GraftDriver(spark,
      java.nio.file.Files.createTempDirectory("graft-val-spec").toString)
    d.createTopic("constrained", validator = Validator.SchemaValidator(
      """{"type":"object","required":["k"],
        | "properties":{"k":{"type":"integer","minimum":0,"maximum":9}}}""".stripMargin))
    val topic = d.openTopic("constrained")
    val p = topic.producer()
    p.push("""{"k":5}""")
    p.flush() // fine
    p.push("""{"k":12}""") // over maximum
    intercept[Exception] { p.flush() }
    assert(topic.events().count() == 1)
  }

  test("required fields must be declared in properties - rejected at DDL time") {
    // an undeclared required name has no type to extract by: constructing
    // the validator (createTopic's plugin check) must fail readably, not
    // every later produce with an opaque analyzer error
    val e = intercept[IllegalArgumentException](Validator.SchemaValidator(
      """{"type":"object","required":["a"],"properties":{}}"""))
    assert(e.getMessage.contains("required field(s) a"), e.getMessage)
    // nested objects get the same check
    val e2 = intercept[IllegalArgumentException](Validator.SchemaValidator(
      """{"type":"object","properties":{"o":{"type":"object","required":["x"]}}}"""))
    assert(e2.getMessage.contains("$.o"), e2.getMessage)
    // declared required fields stay fine
    Validator.SchemaValidator(
      """{"type":"object","properties":{"a":{"type":"number"}},"required":["a"]}""")
  }
}