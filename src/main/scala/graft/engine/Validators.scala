package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.functions.EventBridge

/**
 * Producer-side metadata validation (reference F1-F3): a validator compiles
 * to a Catalyst predicate evaluated at push time; invalid events abort the
 * produce (the reference throws from `Producer.push`,
 * `/root/reference/src/MofkaProducer.cpp:69`).
 *
 * Pluggable via the `FromMetadata` descriptor convention:
 *  - `{"type":"default"}`                      → accept everything
 *  - `{"type":"eventbridge","pattern":{...}}`  → EventBridge pattern predicate
 *  - `{"type":"schema","schema":{...}}`        → JSON-Schema (subset) check,
 *    mirroring the python client's `Validator.from_metadata(type="schema")`
 *    (`/root/reference/python/mochi/mofka/client.py:13-16`)
 */
sealed trait Validator {
  /** True iff the event is acceptable. Pure Column tree — codegen-friendly. */
  def predicate(metadata: Column): Column
  def descriptor: JObject
}

object Validator {

  case object Default extends Validator {
    override def predicate(metadata: Column): Column = lit(true)
    override def descriptor: JObject = TopicConfig.DefaultValidator
  }

  final case class EventBridgeValidator(pattern: String) extends Validator {
    override def predicate(metadata: Column): Column =
      EventBridge.compile(pattern, metadata)
    override def descriptor: JObject = JObject(
      "type" -> JString("eventbridge"),
      "pattern" -> JsonMethods.parse(pattern))
  }

  /**
   * JSON-Schema subset: `type` (object/string/number/integer/boolean/array),
   * `properties`, `required`, `items`. Valid ⇔ the document parses against
   * the derived StructType AND every `required` property is non-null.
   *
   * Divergence (documented): a present-but-mistyped optional field parses to
   * null and is accepted; full JSON-Schema would reject. The required-field
   * path — what the reference test surface exercises — matches.
   */
  final case class SchemaValidator(schemaJson: String) extends Validator {
    private val parsed = JsonMethods.parse(schemaJson)
    val sparkType: DataType = SchemaValidator.toSparkType(parsed)

    override def predicate(metadata: Column): Column = {
      val st = sparkType.asInstanceOf[StructType]
      val doc = from_json(metadata, st)
      val requiredOk = SchemaValidator.required(parsed)
        .map(f => doc.getField(f).isNotNull)
        .foldLeft(lit(true))(_ && _)
      doc.isNotNull && requiredOk
    }

    /** Typed struct view of the metadata (for consumers of schema topics). */
    def typedColumn(metadata: Column): Column =
      from_json(metadata, sparkType.asInstanceOf[StructType])

    override def descriptor: JObject = JObject(
      "type" -> JString("schema"),
      "schema" -> parsed)
  }

  object SchemaValidator {
    private[engine] def required(schema: JValue): Seq[String] = schema \ "required" match {
      case JArray(xs) => xs.collect { case JString(s) => s }
      case _ => Nil
    }

    private[engine] def toSparkType(schema: JValue): DataType = schema \ "type" match {
      case JString("object") =>
        val props = schema \ "properties" match {
          case JObject(fields) => fields.map { case (k, v) => StructField(k, toSparkType(v)) }
          case _ => Nil
        }
        StructType(props)
      case JString("string") => StringType
      case JString("number") => DoubleType
      case JString("integer") => LongType
      case JString("boolean") => BooleanType
      case JString("array") => ArrayType(toSparkType(schema \ "items" match {
        case JNothing => JObject("type" -> JString("string"))
        case items => items
      }))
      case other => throw new IllegalArgumentException(
        s"unsupported JSON-Schema type: ${JsonMethods.compact(JsonMethods.render(other))}")
    }
  }

  /** `FromMetadata` factory (descriptor → implementation). */
  def fromDescriptor(desc: JObject): Validator = desc \ "type" match {
    case JString("default") | JNothing => Default
    case JString("eventbridge") =>
      EventBridgeValidator(JsonMethods.compact(JsonMethods.render(desc \ "pattern")))
    case JString("schema") =>
      SchemaValidator(JsonMethods.compact(JsonMethods.render(desc \ "schema")))
    case other => throw new IllegalArgumentException(
      s"unknown validator type: ${JsonMethods.compact(JsonMethods.render(other))}")
  }
}
