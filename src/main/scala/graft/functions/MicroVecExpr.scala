package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/**
 * Native micro-unit vector conversion: `array<float|double>` →
 * `array<bigint>` with element `round(x · 1e6)` — ONE compiled loop.
 *
 * Replaces the `transform(embedding, x => round(x.cast(double) * 1e6)
 * .cast(long))` projection in [[graft.pipeline.DataOps]] `emb`: the
 * `transform` lambda is CodegenFallback, and `emb` feeds EVERY
 * embedding-family query (the ANN paths, dedupEmbed, embedQuantize,
 * embedPq, embedKmeans, docEmbedStats), so this one projection sat
 * interpreted directly over the embeddings SCAN in all of them —
 * flagged by CodegenLintSpec.
 *
 * Rounding reproduces Spark's `round(double)` → `cast(long)` exactly
 * (BigDecimal HALF_UP on the shortest decimal representation — the
 * [[CategoryHitsExpr]] precedent), pinned bit-identical to the composed
 * form on random floats in NativeExprPropertiesSpec. Null elements pass
 * through as null, like `transform`.
 */
case class MicroVecExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"micro_vec requires array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(LongType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)

  override def nullSafeEval(input: Any): Any =
    MicroVecExpr.compute(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MicroVecExpr$$.MODULE$$" +
        s".compute($c, $isFloat);")

  override protected def withNewChildInternal(
      newChild: Expression): MicroVecExpr = copy(child = newChild)

  override def prettyName: String = "micro_vec"
}

object MicroVecExpr {

  /** One pass: element-wise round(x · 1e6) as long, null-preserving. */
  def compute(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val d = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        out(i) = java.math.BigDecimal.valueOf(d * 1000000.0)
          .setScale(0, RoundingMode.HALF_UP).longValue()
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  private val info = new ExpressionInfo(
    classOf[MicroVecExpr].getCanonicalName, "micro_vec")

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("micro_vec"), info,
      (children: Seq[Expression]) => {
        require(children.length == 1, "micro_vec(vec)")
        MicroVecExpr(children.head)
      })

  /** Micro-unit integer form of a float/double vector column. */
  def micro(spark: SparkSession, vec: Column): Column = {
    register(spark)
    call_function("micro_vec", vec)
  }
}
