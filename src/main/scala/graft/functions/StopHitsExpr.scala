package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.nlp.Lexicons

/**
 * Native stopword-hit counter over a token array — ONE compiled pass,
 * one hash probe per token.
 *
 * Replaces `size(filter(toks, t => array_contains(stopwords, t)))` in
 * [[graft.pipeline.DataOps.textQualityMetrics]]: the `filter` lambda is
 * CodegenFallback (the WordGramsExpr failure class), and this single
 * projection sat over the documents SCAN in six registry queries
 * (textQuality, qualityTrend, gopherFilter, keepBestPerSource,
 * docEmbedStats, retentionDecision) — flagged by CodegenLintSpec.
 *
 * Semantics are identical to the composed form: each non-null token
 * contributes 1 when it is in [[Lexicons.stopwords]] (multiplicity
 * counts — intentionally NOT `array_intersect`, which dedups); null
 * tokens never match (`array_contains` yields null → filtered out).
 */
case class StopHitsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"stop_hits requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    StopHitsExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StopHitsExpr$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): StopHitsExpr = copy(child = newChild)

  override def prettyName: String = "stop_hits"
}

object StopHitsExpr {

  private val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    Lexicons.stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** One pass: count of non-null tokens present in the stopword set. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    var hits = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && stopSet.contains(arr.getUTF8String(i)))
        hits += 1L
      i += 1
    }
    hits
  }

  private val info = new ExpressionInfo(
    classOf[StopHitsExpr].getCanonicalName, "stop_hits")

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("stop_hits"), info,
      (children: Seq[Expression]) => {
        require(children.length == 1, "stop_hits(tokens)")
        StopHitsExpr(children.head)
      })

  /** Stopword hit count of a token-array column. */
  def hits(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    call_function("stop_hits", tokens)
  }
}
