package graft.functions

import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/**
 * Property check (SURVEY §5): random flat patterns against random documents
 * — the compiled predicate (both the per-field `get_json_object` path and
 * the single-parse struct path) must agree with a direct Scala evaluation
 * of the documented matcher semantics.
 */
class EventBridgePropertySpec extends SparkSpec {

  private val keys = Seq("k1", "k2", "k3", "k4")
  private val strings = Seq("alpha", "beta", "gamma", "al", "betamax")

  private sealed trait M
  private case class MExact(v: Either[String, Int]) extends M
  private case class MList(vs: Seq[Either[String, Int]]) extends M
  private case class MPrefix(p: String) extends M
  private case class MNumeric(op: String, v: Int) extends M
  private case class MExists(b: Boolean) extends M
  private case class MAnythingBut(v: Either[String, Int]) extends M

  private val genScalar: Gen[Either[String, Int]] = Gen.oneOf(
    Gen.oneOf(strings).map(Left(_)), Gen.choose(0, 20).map(Right(_)))

  private val genMatcher: Gen[M] = Gen.oneOf(
    genScalar.map(MExact),
    Gen.listOfN(2, genScalar).map(MList),
    Gen.oneOf("al", "be", "x").map(MPrefix),
    for { op <- Gen.oneOf("<", "<=", ">", ">=", "="); v <- Gen.choose(0, 20) }
      yield MNumeric(op, v),
    Gen.oneOf(true, false).map(MExists),
    genScalar.map(MAnythingBut))

  private val genPattern: Gen[Map[String, M]] = for {
    n <- Gen.choose(1, 3)
    ks <- Gen.pick(n, keys)
    ms <- Gen.listOfN(n, genMatcher)
  } yield ks.zip(ms).toMap

  private val genDoc: Gen[Map[String, Either[String, Int]]] = for {
    present <- Gen.someOf(keys)
    vs <- Gen.listOfN(present.size, genScalar)
  } yield present.zip(vs).toMap

  // ---- documented semantics, evaluated directly ---------------------------

  private def text(v: Either[String, Int]): String = v.fold(identity, _.toString)
  private def asNum(s: String): Option[Double] =
    if (s.matches("^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$")) Some(s.toDouble) else None

  private def holds(m: M, docVal: Option[String]): Boolean = m match {
    case MExact(Left(s)) => docVal.contains(s)
    case MExact(Right(n)) => docVal.flatMap(asNum).contains(n.toDouble)
    case MList(vs) => vs.exists(v => holds(MExact(v), docVal))
    case MPrefix(p) => docVal.exists(_.startsWith(p))
    case MNumeric(op, v) => docVal.flatMap(asNum).exists { d =>
      op match {
        case "<" => d < v; case "<=" => d <= v; case ">" => d > v
        case ">=" => d >= v; case "=" => d == v
      }
    }
    case MExists(b) => docVal.isDefined == b
    case MAnythingBut(v) => docVal.isDefined && !holds(MExact(v), docVal)
  }

  // ---- JSON rendering -----------------------------------------------------

  private def scalarJson(v: Either[String, Int]): JValue =
    v.fold(JString(_), JInt(_))

  private def matcherJson(m: M): JValue = m match {
    case MExact(v) => scalarJson(v)
    case MList(vs) => JArray(vs.map(scalarJson).toList)
    case MPrefix(p) => JArray(List(JObject("prefix" -> JString(p))))
    case MNumeric(op, v) => JArray(List(JObject(
      "numeric" -> JArray(List(JString(op), JInt(v))))))
    case MExists(b) => JArray(List(JObject("exists" -> JBool(b))))
    case MAnythingBut(v) => JArray(List(JObject("anything-but" -> scalarJson(v))))
  }

  private def patternJson(p: Map[String, M]): String =
    JsonMethods.compact(JsonMethods.render(
      JObject(p.toList.map { case (k, m) => k -> matcherJson(m) })))

  private def docJson(d: Map[String, Either[String, Int]]): String =
    JsonMethods.compact(JsonMethods.render(
      JObject(d.toList.map { case (k, v) => k -> scalarJson(v) })))

  test("compiled predicate (both paths) agrees with direct evaluation") {
    import spark.implicits._
    val cases = (0 until 250).flatMap { i =>
      val params = Gen.Parameters.default
      for {
        p <- genPattern.apply(params, Seed(i.toLong))
        d <- genDoc.apply(params, Seed((i + 1000).toLong))
      } yield (p, d)
    }
    assert(cases.size >= 200)

    cases.grouped(50).foreach { group =>
      val row = Seq("x").toDF("dummy").select(group.zipWithIndex.flatMap {
        case ((p, d), i) =>
          val pat = patternJson(p)
          val doc = lit(docJson(d))
          val parsed = from_json(doc, EventBridge.schemaFor(pat))
          Seq(
            EventBridge.compile(pat, doc).as(s"json$i"),
            EventBridge.compileWithStruct(pat, parsed).as(s"struct$i"))
      }: _*).collect()(0)

      group.zipWithIndex.foreach { case ((p, d), i) =>
        val expected = p.forall { case (k, m) => holds(m, d.get(k).map(text)) }
        def b(name: String): Boolean =
          !row.isNullAt(row.fieldIndex(name)) && row.getBoolean(row.fieldIndex(name))
        assert(b(s"json$i") == expected,
          s"get_json_object path: pattern=${patternJson(p)} doc=${docJson(d)}")
        assert(b(s"struct$i") == expected,
          s"struct path: pattern=${patternJson(p)} doc=${docJson(d)}")
      }
    }
  }
}
