package graft.engine

import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Topic-level configuration: the (validator, partition-selector, serializer)
 * plugin triple plus partition count and completion flag — the Spark-side
 * equivalent of the reference's master-catalog keys
 * `MOFKA:GLOBAL:<topic>:{validator,selector,serializer}` and the partitions
 * collection (`/root/reference/src/MofkaDriver.cpp:212-257`).
 *
 * Each descriptor is an arbitrary JSON object with a `"type"` key, matching
 * the reference's `FromMetadata` plugin-factory convention
 * (`MofkaDriver.cpp:390-395`): the descriptor is persisted verbatim in the
 * catalog and re-hydrated into a compiled implementation on open.
 */
final case class TopicConfig(
    name: String,
    partitions: Int,
    validator: JObject,
    selector: JObject,
    serializer: JObject,
    completed: Boolean) {

  def toJson: String = JsonMethods.compact(JsonMethods.render(JObject(
    "name" -> JString(name),
    "partitions" -> JInt(partitions),
    "validator" -> validator,
    "selector" -> selector,
    "serializer" -> serializer,
    "completed" -> JBool(completed))))
}

object TopicConfig {

  val DefaultValidator: JObject = JObject("type" -> JString("default"))
  val DefaultSelector: JObject = JObject("type" -> JString("roundrobin"))
  val DefaultSerializer: JObject = JObject("type" -> JString("json"))

  def apply(name: String, partitions: Int): TopicConfig =
    TopicConfig(name, partitions, DefaultValidator, DefaultSelector,
      DefaultSerializer, completed = false)

  def fromJson(json: String): TopicConfig = JsonMethods.parse(json) match {
    case o: JObject =>
      def obj(key: String, dflt: JObject): JObject = o \ key match {
        case sub: JObject => sub
        case JNothing => dflt
        case other => throw new IllegalArgumentException(
          s"topic config key '$key' must be an object, got ${JsonMethods.compact(other)}")
      }
      val name = o \ "name" match {
        case JString(s) => s
        case _ => throw new IllegalArgumentException("topic config missing 'name'")
      }
      val partitions = o \ "partitions" match {
        case JInt(n) => n.toInt
        case _ => throw new IllegalArgumentException("topic config missing 'partitions'")
      }
      val completed = o \ "completed" match {
        case JBool(b) => b
        case _ => false
      }
      TopicConfig(name, partitions, obj("validator", DefaultValidator),
        obj("selector", DefaultSelector), obj("serializer", DefaultSerializer),
        completed)
    case other => throw new IllegalArgumentException(
      s"topic config must be a JSON object: ${JsonMethods.compact(other)}")
  }
}
