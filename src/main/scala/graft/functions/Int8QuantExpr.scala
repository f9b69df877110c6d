package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused int8 scalar quantization of a micro-unit vector — min/max,
 * affine [-127,127] codes, the md5 code fingerprint and the exact
 * integer reconstruction-error sum in ONE compiled pass
 * ([[graft.pipeline.DataOps.embedQuantize]]'s kernel).
 *
 * Replaces a `transform` (codes) + `zip_with`+`aggregate` (error sum) +
 * `transform`+`array_join` (fingerprint) composition — all
 * CodegenFallback, sitting directly over the embeddings SCAN
 * (CodegenLintSpec finding).
 *
 * Bit-identical semantics: code_i = round((x−mn)·254.0 / (mx−mn)) − 127
 * with Spark's double rounding (BigDecimal HALF_UP — the
 * [[CategoryHitsExpr]] precedent) and the same operand order; fp =
 * lowercase-hex md5 of the codes joined by "," as decimal strings;
 * errnum = Σ |254·(x−mn) − (q+127)·(mx−mn)| exact int64; mae_micro =
 * round(errnum / (254.0 · dim)). Returns null for an empty vector (the
 * composed form's mn/mx go null there too; the corpus never has one).
 */
case class Int8QuantExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int8_quant requires array<bigint>, got ${other.catalogString}")
  }

  override def nullable: Boolean = true

  override def dataType: DataType = Int8QuantExpr.Schema

  override def nullSafeEval(input: Any): Any =
    Int8QuantExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("quant")
      s"""org.apache.spark.sql.catalyst.InternalRow $r =
         |  graft.functions.Int8QuantExpr$$.MODULE$$.compute($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Int8QuantExpr = copy(child = newChild)

  override def prettyName: String = "int8_quant"
}

object Int8QuantExpr {

  val Schema: StructType = StructType(Seq(
    StructField("mn_micro", LongType, nullable = false),
    StructField("mx_micro", LongType, nullable = false),
    StructField("fp", StringType, nullable = false),
    StructField("mae_micro", LongType, nullable = false)))

  private val HexDigits = "0123456789abcdef".toCharArray

  private def round0(d: Double): Long =
    java.math.BigDecimal.valueOf(d)
      .setScale(0, RoundingMode.HALF_UP).longValue()

  /** One pass over the micro-unit vector; null for an empty vector or
    * one with a null element (the composed form's aggregates go null on
    * both; the engine's contract-checked corpus has neither). */
  def compute(a: ArrayData): InternalRow = {
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
    val range = mx - mn
    val sb = new java.lang.StringBuilder()
    var errnum = 0L
    i = 0
    while (i < n) {
      val q =
        if (range > 0L)
          round0((xs(i) - mn).toDouble * 254.0 / range.toDouble) - 127L
        else 0L
      if (i > 0) sb.append(',')
      sb.append(q)
      errnum += math.abs((xs(i) - mn) * 254L - (q + 127L) * range)
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(sb.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    val hex = new Array[Char](32)
    i = 0
    while (i < 16) {
      hex(2 * i) = HexDigits((d(i) >> 4) & 0xf)
      hex(2 * i + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    val mae = round0(errnum.toDouble / (254.0 * n.toDouble))
    new GenericInternalRow(Array[Any](mn, mx,
      UTF8String.fromString(new String(hex)), mae))
  }

  private val info = new ExpressionInfo(
    classOf[Int8QuantExpr].getCanonicalName, "int8_quant")

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("int8_quant"), info,
      (children: Seq[Expression]) => {
        require(children.length == 1, "int8_quant(vec)")
        Int8QuantExpr(children.head)
      })

  /** The quantization struct of a micro-unit vector column. */
  def quant(spark: SparkSession, vec: Column): Column = {
    register(spark)
    call_function("int8_quant", vec)
  }
}
