package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused repetition-statistics expression: ONE compiled pass per document
 * producing `struct(n_tok, n_distinct_tok, bigram_total, bigram_max)` —
 * the four inputs of [[graft.pipeline.DataOps.retentionDecision]]'s
 * repetition gate.
 *
 * Replaces the previous composition of two [[WordGramsExpr]] arrays,
 * an `array_sort`, and an `aggregate()` higher-order longest-equal-run
 * fold: the HOF lambda is CodegenFallback, so that one column dropped
 * the whole Project out of whole-stage codegen and re-paid interpreted
 * evaluation per row (the same failure class WordGramsExpr was built to
 * purge — measured several-fold inflation under container contention).
 * Here the max-per-bigram count comes from a single open-addressed pass
 * over the tokens, no gram arrays are materialized, and the expression
 * stays inside codegen.
 *
 * Semantics (bit-identical to the composed form and the DuckDB oracle):
 * tokens are maximal non-empty runs between single spaces (0x20), a
 * bigram is two consecutive tokens joined by one space, `bigram_total`
 * is max(n_tok-1, 0), and `bigram_max` is the count of the most frequent
 * bigram (0 when no bigrams).
 */
case class GramStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_stats requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = GramStatsExpr.Schema

  override def nullSafeEval(input: Any): Any =
    GramStatsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramStatsExpr$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): GramStatsExpr = copy(child = newChild)

  override def prettyName: String = "gram_stats"
}

object GramStatsExpr {

  val Schema: StructType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_distinct_tok", LongType, nullable = false),
    StructField("bigram_total", LongType, nullable = false),
    StructField("bigram_max", LongType, nullable = false)))

  /** Tokenize on 0x20 and count in one pass; the bigram map keys on the
    * interned (prev, cur) token-id pair packed into one long, so no
    * joined string is built per bigram. */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
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
    val ntok = words.size
    // Intern tokens to dense int ids; the id map doubles as the distinct
    // set, and bigrams key on the packed (prevId << 32 | curId) long —
    // no joined-string allocation per bigram.
    val ids = new java.util.HashMap[String, Integer](ntok * 2)
    val tokId = new Array[Int](ntok)
    var k = 0
    while (k < ntok) {
      val w = words.get(k)
      var id = ids.get(w)
      if (id == null) { id = Integer.valueOf(ids.size); ids.put(w, id) }
      tokId(k) = id.intValue
      k += 1
    }
    var maxc = 0
    if (ntok > 1) {
      val counts = new java.util.HashMap[java.lang.Long, Integer](ntok * 2)
      k = 0
      while (k < ntok - 1) {
        val key = (tokId(k).toLong << 32) | (tokId(k + 1).toLong & 0xffffffffL)
        val c = counts.merge(java.lang.Long.valueOf(key), 1,
          (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
        if (c.intValue > maxc) maxc = c.intValue
        k += 1
      }
    }
    new GenericInternalRow(Array[Any](ntok.toLong, ids.size.toLong,
      math.max(ntok - 1, 0).toLong, maxc.toLong))
  }

  private val info = new ExpressionInfo(
    classOf[GramStatsExpr].getCanonicalName, "gram_stats")

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("gram_stats"), info,
      (children: Seq[Expression]) => {
        require(children.length == 1, "gram_stats(text)")
        GramStatsExpr(children.head)
      })

  /** The stats struct of a text column as a Column. */
  def gramStats(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("gram_stats", text)
  }
}
