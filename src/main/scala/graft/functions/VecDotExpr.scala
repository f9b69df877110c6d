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
 * form and the DuckDB oracles' per-element join sums. A NULL element in
 * either array yields a NULL result — the same answer the composed
 * HOF form gave (`null * x` poisons the `aggregate` sum), and the reason
 * `nullable` is unconditionally true: vec_dot is session-SQL-reachable,
 * so user arrays with containsNull=true must degrade to NULL, not NPE.
 */
case class VecDotExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullable: Boolean = true

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
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dot")
      s"""java.lang.Long $boxed =
         |  graft.functions.VecDotExpr$$.MODULE$$.compute($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDotExpr = copy(newLeft, newRight)

  override def prettyName: String = "vec_dot"
}

object VecDotExpr {

  /** One compiled pass: Σ a(i)·b(i), exact int64; null if any summed
    * slot holds a NULL element (the composed HOF form's answer). Boxed
    * return so codegen can branch on it — engine-internal arrays are
    * containsNull=false, so the fast path never boxes per element. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(s)
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
