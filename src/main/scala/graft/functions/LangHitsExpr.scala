package graft.functions

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

import graft.nlp.Lexicons

/**
 * Native language-ID scorer over a token array: per-profile occurrence
 * hits and the (hits desc, lang asc) argmax in ONE compiled pass, one
 * hash probe per token (word → language bitmask).
 *
 * Replaces [[graft.pipeline.DataOps.langIdCols]]'s per-language
 * `size(filter(toks, array_contains(profile)))` columns — one
 * CodegenFallback lambda PER LANGUAGE, all over the documents scan in
 * retentionDecision's stateless gate pass (the last CodegenLintSpec
 * finding standing).
 *
 * Semantics are identical to the composed `greatest(struct(hits, -i,
 * lang))` argmax over [[Lexicons.langProfiles]] sorted by language:
 * hits count token occurrences (multiplicity — a profile word appearing
 * twice counts twice), ties go to the alphabetically first language.
 * The zero-hit → 'und' rule stays in the column layer, as before.
 */
case class LangHitsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lang_hits requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LangHitsExpr.Schema

  override def nullSafeEval(input: Any): Any =
    LangHitsExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LangHitsExpr$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): LangHitsExpr = copy(child = newChild)

  override def prettyName: String = "lang_hits"
}

object LangHitsExpr {

  val Schema: StructType = StructType(Seq(
    StructField("hits", LongType, nullable = false),
    StructField("lang_pred", StringType, nullable = false)))

  /** Languages in the composed form's order (lang asc). */
  private val langs: Array[UTF8String] = Lexicons.langProfiles
    .sortBy(_._1).map(p => UTF8String.fromString(p._1)).toArray

  /** word → bitmask of the profiles listing it. */
  private val wordMask: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    Lexicons.langProfiles.sortBy(_._1).zipWithIndex.foreach {
      case ((_, ws), i) => ws.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf(
          (if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  /** One pass: per-profile hit counts, argmax (hits desc, lang asc). */
  def compute(arr: ArrayData): InternalRow = {
    val counts = new Array[Long](langs.length)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val mask = wordMask.get(arr.getUTF8String(i))
        if (mask != null) {
          var m = mask.intValue()
          while (m != 0) {
            counts(java.lang.Integer.numberOfTrailingZeros(m)) += 1L
            m &= m - 1
          }
        }
      }
      i += 1
    }
    var best = 0
    var l = 1
    while (l < counts.length) {
      if (counts(l) > counts(best)) best = l
      l += 1
    }
    new GenericInternalRow(Array[Any](counts(best), langs(best)))
  }

  private val info = new ExpressionInfo(
    classOf[LangHitsExpr].getCanonicalName, "lang_hits")

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("lang_hits"), info,
      (children: Seq[Expression]) => {
        require(children.length == 1, "lang_hits(tokens)")
        LangHitsExpr(children.head)
      })

  /** The best-profile struct of a token-array column. */
  def best(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    call_function("lang_hits", tokens)
  }
}
