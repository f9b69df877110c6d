package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.nlp.Lexicons

/**
 * Native entity-mention extractor for the X2 surface (reference
 * SentimentAnalysis.scala:62-93): text → array of mention strings =
 * lowercased `[A-Z][a-z]+` capitalized-word matches of the ORIGINAL
 * text, followed by the `[a-z]+` tokens of the lowercased text that
 * appear in the NER lexicon — order and duplicates preserved, exactly
 * like the composed `concat(transform(regexp_extract_all(..), lower),
 * filter(tokens, array_contains(..)))` form it replaces.
 *
 * The composed form's `transform`/`filter` lambdas are CodegenFallback,
 * knocking every entity-path Project (x2Entities, w3EntityCount,
 * w7EntityOpinion, trending, and the streaming entity branch) out of
 * whole-stage codegen into interpreted eval. This expression does one
 * compiled scan for the capitalized matches and one for the lexicon
 * tokens (hash-set probe per token) and stays inside codegen.
 *
 * Regex parity notes: `[A-Z]`/`[a-z]` are ASCII-only classes in both
 * Java and RE2, and `regexp_extract_all` takes non-overlapping greedy
 * matches left-to-right — the hand scan reproduces exactly that
 * (maximal `[a-z]` run after the capital; a failed start advances one
 * char). Lowercasing uses `UTF8String.toLowerCase`, the same call
 * Spark's `lower()` makes.
 */
case class EntityMentionsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"entity_mentions requires string, got ${other.catalogString}")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    EntityMentionsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.EntityMentionsExpr$$.MODULE$$" +
        s".compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): EntityMentionsExpr = copy(child = newChild)

  override def prettyName: String = "entity_mentions"
}

object EntityMentionsExpr {

  /** NER lexicon as a string set (executor-side static, same
    * [[Lexicons.entityTerms]] the oracle inlines). */
  private val terms: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](Lexicons.entityTerms.size * 2)
    Lexicons.entityTerms.foreach(s.add)
    s
  }

  /** Two compiled scans: capitalized-word matches over the original
    * text, then lexicon-member `[a-z]+` tokens of the lowercase text. */
  def compute(text: UTF8String): ArrayData = {
    val out = new java.util.ArrayList[Any]()
    val s = text.toString
    val len = s.length
    // pass 1: non-overlapping greedy [A-Z][a-z]+ matches, lowercased
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      if (c >= 'A' && c <= 'Z' && i + 1 < len && {
        val d = s.charAt(i + 1); d >= 'a' && d <= 'z'
      }) {
        var j = i + 1
        while (j < len && { val d = s.charAt(j); d >= 'a' && d <= 'z' }) j += 1
        val sb = new java.lang.StringBuilder(j - i)
        sb.append((c + 32).toChar).append(s, i + 1, j)
        out.add(UTF8String.fromString(sb.toString))
        i = j
      } else i += 1
    }
    // pass 2: [a-z]+ runs of the lowercased text, kept when in-lexicon
    val low = text.toLowerCase.toString
    val llen = low.length
    i = 0
    while (i < llen) {
      val c = low.charAt(i)
      if (c >= 'a' && c <= 'z') {
        var j = i + 1
        while (j < llen && {
          val d = low.charAt(j); d >= 'a' && d <= 'z'
        }) j += 1
        val tok = low.substring(i, j)
        if (terms.contains(tok)) out.add(UTF8String.fromString(tok))
        i = j
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private val info = new ExpressionInfo(
    classOf[EntityMentionsExpr].getCanonicalName, "entity_mentions")

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("entity_mentions"), info,
      (children: Seq[Expression]) => EntityMentionsExpr(children.head))

  /** The extractor as a Column over a text column. */
  def mentions(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("entity_mentions", text)
  }
}
