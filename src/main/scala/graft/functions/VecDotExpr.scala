package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native exact-integer vector dot product over `array<bigint>` columns —
 * ONE compiled loop per row.
 *
 * Replaces the `aggregate(zip_with(a, b, _*_), 0L, _+_)` higher-order
 * composition used by every embedding operator (dot, norm², LSH plane
 * projections): HOF lambdas are CodegenFallback, so each of those columns
 * dropped its projection out of whole-stage codegen and paid interpreted
 * evaluation per row — the WordGramsExpr failure class, here multiplied
 * by the ANN family's candidate counts.
 *
 * Semantics: Σ a(i)·b(i) over the first min(|a|,|b|) elements in exact
 * int64 (the engine's micro-unit contract keeps every product and sum in
 * range — [[graft.pipeline.DataOps]] `emb`). Engine arrays are always
 * equal-length (dim = 64), where this is bit-identical to the composed
 * form and the DuckDB oracles' per-element join sums.
 */
case class VecDotExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<bigint> both sides, got " +
          s"${l.catalogString} / ${r.catalogString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDotExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecDotExpr$$.MODULE$$.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDotExpr = copy(newLeft, newRight)

  override def prettyName: String = "vec_dot"
}

object VecDotExpr {

  /** One compiled pass: Σ a(i)·b(i), exact int64. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  private val info = new ExpressionInfo(
    classOf[VecDotExpr].getCanonicalName, "vec_dot")

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("vec_dot"), info,
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot(a, b)")
        VecDotExpr(children.head, children(1))
      })

  /** Exact dot product of two `array<bigint>` columns. */
  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("vec_dot", a, b)
  }
}
