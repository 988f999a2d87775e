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
 * Two parse shapes are collapsed (both appear in real plans — the first from
 * `get_json_object` predicates, the second from the EventBridge matcher's
 * single-parse path after Spark's own `OptimizeJsonExprs` prunes the parse
 * schema down to one field per access):
 *
 *   get_json_object(to_json(named_struct('k', e, …)), '$.k')       ⇒  text(e)
 *   from_json(to_json(named_struct('k', e, …)), 'k string').k      ⇒  text(e)
 *
 * where `text(e)` is `e` itself for a string field and `cast(e as string)`
 * for integral / boolean / double / float fields. Value identity per type:
 *
 *  - *integrals and booleans*: Jackson writes plain decimal / `true|false`,
 *    byte-identical to Spark's cast.
 *  - *double/float*: both Jackson's generator (fast-writer off, Spark's
 *    default) and Spark's cast print via `Double.toString`/`Float.toString`,
 *    including `NaN`/`Infinity` (Jackson quotes them; both parse paths
 *    surface the bare text). Verified over the edge set (±0.0, denormals,
 *    E-notation bounds, NaN, ±Inf) in JsonRoundTripSpec.
 *  - *strings*: Jackson escape→unescape is the identity on valid strings
 *    (quotes, backslashes, control chars, non-BMP unicode pinned in the
 *    spec); `get_json_object` unquotes leaf strings and `from_json` returns
 *    the parsed text.
 *  - a null field value and an absent field both surface as NULL on every
 *    path (`to_json` omits null fields; with `ignoreNullFields=false` the
 *    parsers still return NULL for a JSON null), matching the raw field /
 *    `cast(null as string)`.
 *
 * A parse-schema field *not present* in the generating struct collapses to a
 * typed NULL literal (the generator can never emit it). Nested structs
 * collapse recursively when every leaf is collapsible. NOT rewritten:
 * decimal/date/timestamp/binary and complex-typed fields (their text forms
 * are option/locale-dependent), multi-segment `$.a.b` paths on the
 * `get_json_object` side, parses with options, and structs with duplicate
 * or non-literal field names.
 *
 * A companion simplification removes the string detour the first rewrite
 * leaves behind when the caller immediately casts back:
 *
 *   cast(cast(e: integral as string) as byte/short/int/long/double)  ⇒  cast(e as …)
 *   cast(cast(e: double as string) as double)                        ⇒  e
 *   cast(cast(e: float  as string) as float)                         ⇒  e
 *
 * (an integral's decimal string parses back exactly; `Double.toString` /
 * `Float.toString` round-trip exactly at the SAME width — float→double via
 * the string detour is NOT identity (the shortest-repr decimal re-parses to
 * a different double than the exact binary widening) and keeps the chain,
 * as do narrowing casts, whose wrap-vs-null semantics differ).
 *
 * Why this matters here: the engine-contract fixtures produce topic batches
 * whose metadata is `to_json(struct(event_id AS eid))` and then slice them
 * with `get_json_object(metadata, '$.eid')` predicates, and the EventBridge
 * queries assemble a JSON document per row and match fields out of it —
 * without this rule every such query pays one full JSON generate+parse per
 * FIELD REFERENCE per row (FilterExec evaluates conjuncts independently; no
 * cross-conjunct subexpression elimination). With it the predicates collapse
 * to plain column arithmetic at the scan.
 */
object SimplifyJsonRoundTrip extends Rule[LogicalPlan] {

  private val SimplePath = "^\\$\\.([A-Za-z_][A-Za-z0-9_]*)$".r

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Types whose Jackson number/bool text is byte-identical to Spark's
    * `cast(e as string)` (see the file Scaladoc for the per-type argument). */
  private def castTextIdentical(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case BooleanType | DoubleType | FloatType => true
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

  /** The struct's (name → value) pairs, or None when a name is non-literal
    * or duplicated (a duplicate name makes the generated document ambiguous
    * — Jackson keeps both, parsers disagree on which wins; bail). */
  private def fieldMap(struct: CreateNamedStruct): Option[Seq[(String, Expression)]] = {
    val entries = struct.children.grouped(2).toSeq.map {
      case Seq(Literal(n: UTF8String, StringType), value) => Some(n.toString -> value)
      case _ => None
    }
    if (entries.contains(None)) None
    else {
      val pairs = entries.flatten
      if (pairs.map(_._1).distinct.size != pairs.size) None else Some(pairs)
    }
  }

  /** The string-typed view of one generated field, when provably identical
    * to what the JSON round-trip yields. */
  private def textOf(value: Expression): Option[Expression] = value.dataType match {
    case StringType => Some(value)
    case t if castTextIdentical(t) => Some(Cast(value, StringType).asInstanceOf[Expression])
    case _ => None
  }

  /** Rewrite of `from_json(to_json(struct), …).<field>` for one parse-schema
    * field: the raw field's text for string-typed parse fields, a recursive
    * struct for nested parse fields, a typed NULL for never-generated
    * fields. */
  private def parsedField(struct: CreateNamedStruct, field: StructField): Option[Expression] =
    fieldMap(struct).flatMap { pairs =>
      pairs.find(_._1 == field.name) match {
        case None => Some(Literal(null, field.dataType)) // never generated → parsed NULL
        case Some((_, value)) => field.dataType match {
          case StringType => textOf(value)
          case sub: StructType => value match {
            case inner: CreateNamedStruct =>
              val children = sub.fields.map(f => parsedField(inner, f))
              if (children.forall(_.isDefined))
                Some(CreateNamedStruct(sub.fields.zip(children.map(_.get)).flatMap {
                  case (f, e) =>
                    Seq(Literal(UTF8String.fromString(f.name), StringType), e)
                }.toSeq))
              else None
            case _ => None
          }
          case _ => None
        }
      }
    }

  /** `to_json(struct)` as the optimizer sees it: the analyzer-visible
    * [[StructsToJson]], or the `Invoke(StructsToJsonEvaluator, "evaluate",
    * struct)` the Finish-Analysis `ReplaceExpressions` batch rewrites it to
    * (Spark 4.x) — operator-optimization rules like this one only ever see
    * the latter in real plans. Generator options are deliberately not
    * inspected: none of them changes the VALUE of a string/numeric/boolean
    * leaf (`ignoreNullFields` only toggles omitted-vs-null, both of which
    * parse to NULL; `pretty` only adds whitespace the parsers skip). */
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

  private def generatedStruct(json: Expression): Option[CreateNamedStruct] =
    toJsonOf(json).collect { case s: CreateNamedStruct => s }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case g @ GetJsonObject(json, Literal(path: UTF8String, StringType))
        if generatedStruct(json).isDefined =>
      SimplePath.findFirstMatchIn(path.toString)
        .flatMap { m =>
          val struct = generatedStruct(json).get
          fieldMap(struct).flatMap(_.find(_._1 == m.group(1))) match {
            case Some((_, value)) => textOf(value)
            case None =>
              // absent from the struct → the generator never writes the key
              // → get_json_object returns NULL (guard: only when the struct
              // is fully literal-named, else the lookup itself is unsound)
              fieldMap(struct).map(_ => Literal(null, StringType))
          }
        }
        .getOrElse(g)
    // UPGRADE TRIPWIRE (ADVICE r17): this arm matches only the raw
    // JsonToStructs node. In Spark 4.1 ReplaceExpressions rewrites ONLY the
    // to_json side to its Invoke(evaluator) form (handled in toJsonOf);
    // from_json reaches operator optimization unreplaced. If a future Spark
    // gives JsonToStructs the same treatment, this rewrite silently stops
    // firing — JsonRoundTripSpec's plan-shape assertions ("no from_json in
    // the optimized plan") are the tripwire that catches it on upgrade; the
    // fix is an Invoke(JsonToStructsEvaluator) arm mirroring toJsonOf,
    // extracting schema/options from the evaluator literal.
    case g @ GetStructField(JsonToStructs(ps: StructType, opts, json, _), ord, _)
        if opts.isEmpty && ord >= 0 && ord < ps.length &&
          generatedStruct(json).isDefined =>
      parsedField(generatedStruct(json).get, ps(ord)).getOrElse(g)
    case Cast(Cast(e, StringType, _, _), dt, _, evalMode)
        if isIntegral(e.dataType) && widens(e.dataType, dt) =>
      Cast(e, dt, None, evalMode)
    case Cast(Cast(e, StringType, _, _), dt, _, _)
        if (e.dataType == DoubleType && dt == DoubleType) ||
           (e.dataType == FloatType && dt == FloatType) =>
      e
    // Numeric-shape guard over an already-numeric value (the EventBridge
    // matcher's `asNum`/`numericRange` residue once the round-trip above
    // collapses): `RLIKE(cast(d as string), <numeric shape>)` is exactly
    // "d is finite" — Double.toString/Float.toString print every finite
    // value as `-?ddd.ddd` or `-?d.dddE±dd` (both match the shape) and
    // NaN/±Infinity as words (which do not) — so the per-row
    // double→string materialization and the regex both fold away. The
    // rewrite is gated on the matcher's EXACT regex literal and preserves
    // three-valued logic (null in → null out).
    case RLike(Cast(e, StringType, _, _), Literal(re: UTF8String, StringType))
        if (e.dataType == DoubleType || e.dataType == FloatType) &&
          re.toString == SimplifyJsonRoundTrip.NumericShapeRe =>
      val (pos, neg) =
        if (e.dataType == DoubleType)
          (Literal(Double.PositiveInfinity), Literal(Double.NegativeInfinity))
        else (Literal(Float.PositiveInfinity), Literal(Float.NegativeInfinity))
      If(IsNull(e), Literal(null, BooleanType),
        And(Not(IsNaN(e)),
          And(Not(EqualTo(e, pos)), Not(EqualTo(e, neg)))))
    // Integral flavor: every integral's decimal string matches the shape,
    // so the guard is just the null check (null in → null out).
    case RLike(Cast(e, StringType, _, _), Literal(re: UTF8String, StringType))
        if isIntegral(e.dataType) &&
          re.toString == SimplifyJsonRoundTrip.NumericShapeRe =>
      If(IsNull(e), Literal(null, BooleanType), Literal(true))
  }

  /** The numeric-shape regex [[graft.functions.EventBridge]] guards casts
    * with — the only pattern the finite-value rewrite above fires on. */
  private[functions] val NumericShapeRe =
    "^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$"
}
