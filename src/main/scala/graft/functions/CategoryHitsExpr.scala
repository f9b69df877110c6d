package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.nlp.Lexicons

/**
 * Native classifier expression for the X3 surface
 * (reference SentimentAnalysis.scala:126-148): token array →
 * `array<struct<category, conf_micro>>` of the categories with ≥1 keyword
 * hit, confidence = hits / |tokens| in micro-units.
 *
 * The composed [[graft.nlp.NlpFunctions.categoriesArr]] form builds one
 * `aggregate()` lambda per category (each walking the full token array and
 * probing an `array_contains` over its keyword list) plus a `filter` +
 * `transform` pass — all CodegenFallback, so every classify-path query
 * (x3Categories, r6CategorySentiment, w6CategoryOpinion and the streaming
 * pipeline's category branch) paid interpreted evaluation of
 * O(categories × tokens × keywords) per row. This expression makes ONE
 * compiled pass with ONE hash probe per token (token → category bitmask)
 * and stays inside whole-stage codegen.
 *
 * Semantics are bit-identical to the composed form and the DuckDB oracle:
 * category order is [[Lexicons.categoryKeywords]] declaration order, and
 * conf_micro reproduces Spark's `round((hits/nTok)*1e6)` double rounding
 * (BigDecimal HALF_UP on the shortest decimal representation) exactly.
 */
case class CategoryHitsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"category_hits requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("category", StringType, nullable = false),
      StructField("conf_micro", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CategoryHitsExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CategoryHitsExpr$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): CategoryHitsExpr = copy(child = newChild)

  override def prettyName: String = "category_hits"
}

object CategoryHitsExpr {

  /** Category names in declaration order (= the composed form's
    * `array(perCat: _*)` order, which the oracle mirrors). */
  private val catNames: Array[UTF8String] =
    Lexicons.categoryKeywords.map(c => UTF8String.fromString(c._1)).toArray

  /** keyword → bitmask of the categories listing it (a keyword may appear
    * in several categories; each counts its own hit, exactly like the
    * per-category `array_contains` probes). */
  private val kwMask: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    Lexicons.categoryKeywords.zipWithIndex.foreach { case ((_, kws), i) =>
      kws.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue())
          | (1 << i)))
      }
    }
    m
  }

  /** Spark's `round(double)` → `cast(long)`: HALF_UP on the shortest
    * decimal representation (java BigDecimal.valueOf), NOT Math.round's
    * binary floor(x+0.5) — kept identical so hashes can never diverge on
    * a representation boundary. */
  private def roundMicro(hits: Int, nTok: Int): Long =
    java.math.BigDecimal
      .valueOf(hits.toDouble / nTok.toDouble * 1000000.0)
      .setScale(0, RoundingMode.HALF_UP)
      .longValue()

  /** One pass, one mask probe per token → array of hit categories. */
  def compute(arr: ArrayData): ArrayData = {
    val nCat = catNames.length
    val counts = new Array[Int](nCat)
    val nTok = arr.numElements()
    var i = 0
    while (i < nTok) {
      if (!arr.isNullAt(i)) {
        val mask = kwMask.get(arr.getUTF8String(i))
        if (mask != null) {
          var m = mask.intValue()
          while (m != 0) {
            val b = java.lang.Integer.numberOfTrailingZeros(m)
            counts(b) += 1
            m &= m - 1
          }
        }
      }
      i += 1
    }
    val out = new java.util.ArrayList[Any](nCat)
    var c = 0
    while (c < nCat) {
      if (counts(c) > 0) {
        out.add(new GenericInternalRow(
          Array[Any](catNames(c), roundMicro(counts(c), nTok))))
      }
      c += 1
    }
    new GenericArrayData(out.toArray)
  }

  private val info = new ExpressionInfo(
    classOf[CategoryHitsExpr].getCanonicalName, "category_hits")

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("category_hits"), info,
      (children: Seq[Expression]) => CategoryHitsExpr(children.head))

  /** The classifier as a Column over a token-array column. */
  def cats(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    call_function("category_hits", tokens)
  }
}
