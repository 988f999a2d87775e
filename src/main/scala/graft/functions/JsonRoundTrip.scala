package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Expression-level optimization (guide §1.2 "don't compute things you throw
 * away" / §4 "eliminate per-row work"): collapse a JSON generate→parse
 * round-trip over a locally-built struct into the raw field.
 *
 *   get_json_object(to_json(named_struct('k', e, …)), '$.k')  ⇒  cast(e as string)
 *
 * restricted to INTEGRAL `e` (byte/short/int/long), where both sides are
 * provably the same decimal string: the Jackson generator writes integrals
 * as plain decimal text, `get_json_object` returns a scalar leaf's text
 * unquoted, and a null/absent field surfaces as NULL on both paths
 * (`to_json` omits null fields; `cast(null as string)` is null). Floating
 * types are NOT rewritten (Jackson's double formatting differs from Spark's
 * cast), strings are not rewritten (escape/unescape identity holds but is
 * not worth auditing), nested paths are not rewritten.
 *
 * A companion simplification removes the string detour the first rewrite
 * leaves behind when the caller immediately casts back:
 *
 *   cast(cast(e: integral as string) as byte/short/int/long/double)  ⇒  cast(e as …)
 *
 * (an integral's decimal string parses back to exactly the integral; the
 * final cast keeps any narrowing/widening semantics of the original).
 *
 * Why this matters here: the engine-contract fixtures produce topic batches
 * whose metadata is `to_json(struct(event_id AS eid))` and then slice them
 * with `get_json_object(metadata, '$.eid')` predicates — without this rule
 * every produce pays a full JSON generate+parse pass over the source table
 * inside the filter (the optimizer's own alias substitution creates the
 * round-trip when it pushes the predicate through the projection). With it
 * the predicate collapses to plain integer arithmetic on the scan column.
 * The same shape appears in any user pipeline that re-reads a field from a
 * JSON document it just assembled.
 */
object SimplifyJsonRoundTrip extends Rule[LogicalPlan] {

  private val SimplePath = "^\\$\\.([A-Za-z_][A-Za-z0-9_]*)$".r

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** dt can represent EVERY value of the integral `from` (so dropping the
    * string detour cannot change narrowing semantics: a narrowing cast
    * wraps on the direct path but nulls/errors on the string path — those
    * must keep the round-trip). Double/float round the decimal string and
    * the integral to the same nearest representable value. */
  private def widens(from: DataType, dt: DataType): Boolean = {
    def rank(t: DataType): Int = t match {
      case ByteType => 1; case ShortType => 2; case IntegerType => 3
      case LongType => 4; case _ => -1
    }
    dt == DoubleType || dt == FloatType ||
      (isIntegral(dt) && rank(dt) >= rank(from))
  }

  private def fieldFromStruct(struct: CreateNamedStruct, name: String): Option[Expression] =
    struct.children.grouped(2).collectFirst {
      case Seq(Literal(n: UTF8String, StringType), value)
        if n.toString == name && isIntegral(value.dataType) => value
    }

  /** `to_json(struct)` as the optimizer sees it: the analyzer-visible
    * [[StructsToJson]], or the `Invoke(StructsToJsonEvaluator, "evaluate",
    * struct)` the Finish-Analysis `ReplaceExpressions` batch rewrites it to
    * (Spark 4.x) — operator-optimization rules like this one only ever see
    * the latter in real plans. */
  private def toJsonOf(e: Expression): Option[Expression] = e match {
    case StructsToJson(_, child, _) => Some(child)
    case inv: org.apache.spark.sql.catalyst.expressions.objects.Invoke
        if inv.functionName == "evaluate" && inv.arguments.size == 1 &&
          (inv.targetObject match {
            case Literal(v, _: ObjectType) =>
              v != null && v.getClass.getSimpleName == "StructsToJsonEvaluator"
            case _ => false
          }) =>
      Some(inv.arguments.head)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case g @ GetJsonObject(json, Literal(path: UTF8String, StringType))
        if toJsonOf(json).exists(_.isInstanceOf[CreateNamedStruct]) =>
      SimplePath.findFirstMatchIn(path.toString)
        .flatMap(m => fieldFromStruct(
          toJsonOf(json).get.asInstanceOf[CreateNamedStruct], m.group(1)))
        .map(e => Cast(e, StringType).asInstanceOf[Expression])
        .getOrElse(g)
    case Cast(Cast(e, StringType, _, _), dt, _, evalMode)
        if isIntegral(e.dataType) && widens(e.dataType, dt) =>
      Cast(e, dt, None, evalMode)
  }
}
