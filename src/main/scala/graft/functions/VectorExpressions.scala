package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * `graft_dot(array<double>, array<double>) → double`: sequential-fold dot
 * product as a native Catalyst expression with whole-stage codegen.
 *
 * This is the one hot loop of the similarity-search operators (SURVEY §7.2:
 * "custom Expression only if perf demands" — it does here: the
 * `aggregate(zip_with(...))` formulation is a CodegenFallback chain that
 * allocates a zipped array per row and evaluates lambdas interpretively;
 * this expression is a tight fused loop, ~an order of magnitude faster on
 * 64-dim vectors at corpus scale).
 *
 * Semantics are IDENTICAL to the fold: strict left-to-right summation in
 * double (bit-reproducible across engines), null if either array is null,
 * any element is null, or the lengths differ (matching `zip_with`'s
 * null-padding of the shorter side, which nulls the fold).
 */
final case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // nullSafeEval/doGenCode introduce null beyond the children's nullability
  // (null elements, length mismatch) — without this override the optimizer
  // would fold isNull checks wrongly and codegen would assign an undeclared
  // ev.isNull for non-nullable inputs.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |if ($n != $y.numElements()) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Registration surface for graft's native expressions. */
object GraftFunctions {

  val dotInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
    { children: Seq[Expression] =>
      require(children.size == 2, "graft_dot takes exactly 2 arguments")
      DotProduct(children.head, children(1))
    })

  /** Idempotent session-level registration (for externally-built sessions;
    * sessions built via GraftSession get it from the extensions conf). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(dotInfo._1, dotInfo._2, dotInfo._3)

  /** Column-level constructor — no registration needed. */
  def dot(a: Column, b: Column): Column =
    Shims.column(DotProduct(Shims.expression(a), Shims.expression(b)))
}

/**
 * `spark.sql.extensions`-injectable extensions: registers graft's native
 * functions into every session built with
 * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
 */
final class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction(GraftFunctions.dotInfo)
}
