package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native word-n-gram expression: the single-space tokenize → slide an
 * n-window → join-with-space (→ optionally first-occurrence-distinct)
 * pipeline that the dedup/decontamination/bigram operators previously
 * composed from `filter(split(...))` + `transform(sequence(...))` higher-
 * order functions. Those lambdas are CodegenFallback — the whole Project
 * drops out of whole-stage codegen and every row pays interpreted
 * evaluation (measured: the 3-shingle explode alone cost more than all
 * of dedupMinhash's joins and aggregates combined at sf0.1). This
 * expression computes the same array in ONE compiled pass per document.
 *
 * Semantics (bit-identical to the composed form and the DuckDB oracle):
 *  - tokens are maximal runs between SINGLE-SPACE separators (0x20) with
 *    empties dropped — other whitespace stays inside tokens, exactly
 *    like `split(text, ' ')` + non-empty filter in both engines;
 *  - an n-gram is n consecutive tokens joined by one space;
 *  - fewer than n tokens → empty array;
 *  - `distinct = true` keeps first occurrences in order, matching
 *    `array_distinct`/`list_distinct`.
 */
case class WordGramsExpr(child: Expression, n: Int, distinct: Boolean)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_grams requires string, got ${other.catalogString}")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordGramsExpr.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordGramsExpr$$.MODULE$$" +
        s".compute($c, $n, $distinct);")

  override protected def withNewChildInternal(
      newChild: Expression): WordGramsExpr = copy(child = newChild)

  override def prettyName: String = "word_grams"
}

object WordGramsExpr {

  /** One pass: tokenize on 0x20, slide the n-window, optional distinct. */
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val s = text.toString
    // tokenize: maximal non-empty runs between single spaces
    val words = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      if (s.charAt(i) == ' ') i += 1
      else {
        var j = i + 1
        while (j < len && s.charAt(j) != ' ') j += 1
        words.add(s.substring(i, j))
        i = j
      }
    }
    val m = words.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](m)
    val seen: java.util.HashSet[String] =
      if (distinct) new java.util.HashSet[String](m * 2) else null
    val sb = new java.lang.StringBuilder()
    var k = 0
    while (k < m) {
      sb.setLength(0)
      var g = 0
      while (g < n) {
        if (g > 0) sb.append(' ')
        sb.append(words.get(k + g))
        g += 1
      }
      val gram = sb.toString
      if (!distinct || seen.add(gram)) {
        out.add(UTF8String.fromString(gram))
      }
      k += 1
    }
    new GenericArrayData(out.toArray)
  }

  private val info = new ExpressionInfo(
    classOf[WordGramsExpr].getCanonicalName, "word_grams")

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("word_grams"), info,
      (children: Seq[Expression]) => {
        require(children.length == 3 && children(1).foldable &&
          children(1).dataType == IntegerType && children(2).foldable &&
          children(2).dataType == BooleanType,
          "word_grams(text, n, distinct) requires literal n and distinct")
        WordGramsExpr(children.head,
          children(1).eval().asInstanceOf[Int],
          children(2).eval().asInstanceOf[Boolean])
      })

  /** Word n-grams of a text column as a Column. */
  def grams(spark: SparkSession, text: Column, n: Int,
      distinct: Boolean): Column = {
    register(spark)
    call_function("word_grams", text, lit(n), lit(distinct))
  }
}
