package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Fused SQ8 reconstruction of a micro-unit vector at 254× scale:
 * element i of the result is `254·mn + (q_i + 127)·rng` where
 * `q_i = round((x_i − mn)·254/rng) − 127` is [[Int8QuantExpr]]'s affine
 * int8 code (`q_i = 0` when rng = 0) — i.e. the dequantized vector a
 * scalar-quantized ANN ranks against, kept exact-integer by carrying
 * the 254 denominator ([[graft.pipeline.DataOps.annSq]]'s ADC side).
 *
 * One compiled pass per vector. The composed alternative (explode +
 * per-element join back, or a `transform` lambda) either multiplies the
 * scan by the dimension count or drops to CodegenFallback over the
 * scan — both the failure shapes CodegenLintSpec exists for. Identical
 * code rounding to [[Int8QuantExpr]] (BigDecimal HALF_UP, same operand
 * order), so `vec_dot(qem, sq8_recon(em))` is bit-equal to the DuckDB
 * mirror's per-element formula. Null for an empty vector or one with a
 * null element (the contract-checked corpus has neither).
 */
case class Sq8ReconExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq8_recon requires array<bigint>, got ${other.catalogString}")
  }

  override def nullable: Boolean = true

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Sq8ReconExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("recon")
      s"""org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.Sq8ReconExpr$$.MODULE$$.compute($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Sq8ReconExpr = copy(child = newChild)

  override def prettyName: String = "sq8_recon"
}

object Sq8ReconExpr {

  private def round0(d: Double): Long =
    java.math.BigDecimal.valueOf(d)
      .setScale(0, RoundingMode.HALF_UP).longValue()

  /** One pass: min/max, per-element code, 254-scaled reconstruction. */
  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n == 0) return null
    var c = 0
    while (c < n) {
      if (a.isNullAt(c)) return null
      c += 1
    }
    val xs = a.toLongArray()
    var mn = xs(0)
    var mx = xs(0)
    var i = 1
    while (i < n) {
      if (xs(i) < mn) mn = xs(i)
      if (xs(i) > mx) mx = xs(i)
      i += 1
    }
    val rng = mx - mn
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      val q =
        if (rng > 0L)
          round0((xs(i) - mn).toDouble * 254.0 / rng.toDouble) - 127L
        else 0L
      out(i) = 254L * mn + (q + 127L) * rng
      i += 1
    }
    new GenericArrayData(out)
  }

  private val info = new ExpressionInfo(
    classOf[Sq8ReconExpr].getCanonicalName, "sq8_recon")

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("sq8_recon"), info,
      (children: Seq[Expression]) => {
        require(children.length == 1, "sq8_recon(vec)")
        Sq8ReconExpr(children.head)
      })

  /** The 254×-scaled SQ8 reconstruction of a micro-unit vector. */
  def recon(spark: SparkSession, vec: Column): Column = {
    register(spark)
    call_function("sq8_recon", vec)
  }
}
