package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BooleanType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.nlp.Lexicons

/**
 * Native Catalyst expression fusing the three sentiment-lexicon
 * aggregations of [[graft.nlp.NlpFunctions]] — Σ valence, Σ |valence| and
 * match count — into ONE pass over the token array with ONE hash lookup
 * per token (the `aggregate()`-composed form walks the array three times
 * and re-probes the lexicon map each walk).
 *
 * Scoring semantics are identical to the composed form and to the DuckDB
 * oracle's `lex` join (integer arithmetic only), so swapping it into the
 * pipeline changes no query result — this is purely the
 * custom-`Expression`-with-`doGenCode` performance tier of the builder
 * brief's preference order.
 *
 * Codegen stays inside whole-stage codegen: `doGenCode` emits a call to
 * the static [[ValenceStatsExpr.compute]] over the already-materialized
 * `ArrayData`, the same shape Spark's own collection expressions use.
 */
case class ValenceStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"valence_stats requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("sv", IntegerType, nullable = false),
    StructField("sav", IntegerType, nullable = false),
    StructField("n", IntegerType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    ValenceStatsExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ValenceStatsExpr$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): ValenceStatsExpr = copy(child = newChild)

  override def prettyName: String = "valence_stats"
}

object ValenceStatsExpr {

  /** Lexicon as a UTF8String-keyed map (executor-side static; built once
    * per JVM from the same [[Lexicons.valence]] the oracle replays). */
  private val lex: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](
      Lexicons.valence.size * 2)
    Lexicons.valence.foreach { case (w, v) =>
      m.put(UTF8String.fromString(w), Integer.valueOf(v))
    }
    m
  }

  /** One pass, one lookup per token: (Σv, Σ|v|, #matched). */
  def compute(arr: ArrayData): InternalRow = {
    var sv = 0
    var sav = 0
    var n = 0
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i)) {
        val v = lex.get(arr.getUTF8String(i))
        if (v != null) {
          val x = v.intValue()
          sv += x
          sav += (if (x < 0) -x else x)
          n += 1
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](sv, sav, n))
  }

  private val info = new ExpressionInfo(
    classOf[ValenceStatsExpr].getCanonicalName, "valence_stats")

  /** Idempotent per-session registration — callable from any query
    * builder that received an externally-created SparkSession. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("valence_stats"), info,
      (children: Seq[Expression]) => ValenceStatsExpr(children.head))

  /** The fused scorer as a Column over a token-array column. */
  def stats(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    call_function("valence_stats", tokens)
  }
}

/** `spark.sql.extensions` injection point for ALL of graft's native
  * expressions (`SparkSessionExtensions.injectFunction`): a cluster
  * configured with `spark.sql.extensions=graft.functions.GraftExtensions`
  * gets `valence_stats`, `word_grams`, `category_hits` and `top_k` in
  * every session —
  * usable from pure SQL without any per-session `register` call (the
  * per-query `register` helpers remain for externally-created
  * sessions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("valence_stats"),
      new ExpressionInfo(
        classOf[ValenceStatsExpr].getCanonicalName, "valence_stats"),
      (children: Seq[Expression]) => ValenceStatsExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("word_grams"),
      new ExpressionInfo(
        classOf[WordGramsExpr].getCanonicalName, "word_grams"),
      (children: Seq[Expression]) => {
        require(children.length == 3 && children(1).foldable &&
          children(1).dataType == IntegerType && children(2).foldable &&
          children(2).dataType == BooleanType,
          "word_grams(text, n, distinct) requires literal n and distinct")
        WordGramsExpr(children.head,
          children(1).eval().asInstanceOf[Int],
          children(2).eval().asInstanceOf[Boolean])
      }))
    ext.injectFunction((
      FunctionIdentifier("entity_mentions"),
      new ExpressionInfo(
        classOf[EntityMentionsExpr].getCanonicalName, "entity_mentions"),
      (children: Seq[Expression]) => EntityMentionsExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("category_hits"),
      new ExpressionInfo(
        classOf[CategoryHitsExpr].getCanonicalName, "category_hits"),
      (children: Seq[Expression]) => CategoryHitsExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("top_k"),
      new ExpressionInfo(classOf[TopKAgg].getCanonicalName, "top_k"),
      (children: Seq[Expression]) => {
        require(children.length == 2 && children(1).foldable &&
          children(1).dataType == IntegerType,
          "top_k(expr, k) requires a literal integer k")
        TopKAgg(children.head, children(1).eval().asInstanceOf[Int])
      }))
    ext.injectFunction((
      FunctionIdentifier("gram_stats"),
      new ExpressionInfo(
        classOf[GramStatsExpr].getCanonicalName, "gram_stats"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "gram_stats(text)")
        GramStatsExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("word_gram_hashes"),
      new ExpressionInfo(
        classOf[GramHashesExpr].getCanonicalName, "word_gram_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 3 && children(1).foldable &&
          children(1).dataType == IntegerType && children(2).foldable &&
          children(2).dataType == BooleanType,
          "word_gram_hashes(text, n, distinct) requires literal n/distinct")
        val n = children(1).eval().asInstanceOf[Int]
        require(n >= 1, s"word_gram_hashes requires n >= 1, got $n")
        GramHashesExpr(children.head, n,
          children(2).eval().asInstanceOf[Boolean])
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(
        classOf[VecDotExpr].getCanonicalName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot(a, b)")
        VecDotExpr(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("stop_hits"),
      new ExpressionInfo(
        classOf[StopHitsExpr].getCanonicalName, "stop_hits"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "stop_hits(tokens)")
        StopHitsExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("micro_vec"),
      new ExpressionInfo(
        classOf[MicroVecExpr].getCanonicalName, "micro_vec"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "micro_vec(vec)")
        MicroVecExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("doc_fingerprint"),
      new ExpressionInfo(
        classOf[FingerprintExpr].getCanonicalName, "doc_fingerprint"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "doc_fingerprint(text)")
        FingerprintExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("int8_quant"),
      new ExpressionInfo(
        classOf[Int8QuantExpr].getCanonicalName, "int8_quant"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "int8_quant(vec)")
        Int8QuantExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("lang_hits"),
      new ExpressionInfo(
        classOf[LangHitsExpr].getCanonicalName, "lang_hits"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "lang_hits(tokens)")
        LangHitsExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("char_gram_hashes"),
      new ExpressionInfo(
        classOf[CharGramHashesExpr].getCanonicalName, "char_gram_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2 && children(1).foldable &&
          children(1).dataType == IntegerType,
          "char_gram_hashes(text, k) requires a literal k")
        val k = children(1).eval().asInstanceOf[Int]
        require(k >= 1, s"char_gram_hashes requires k >= 1, got $k")
        CharGramHashesExpr(children.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("char_gram_counts"),
      new ExpressionInfo(
        classOf[CharGramCountsExpr].getCanonicalName, "char_gram_counts"),
      (children: Seq[Expression]) => {
        require(children.length == 2 && children(1).foldable &&
          children(1).dataType == IntegerType,
          "char_gram_counts(text, k) requires a literal k")
        val k = children(1).eval().asInstanceOf[Int]
        require(k >= 1, s"char_gram_counts requires k >= 1, got $k")
        CharGramCountsExpr(children.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("sq8_recon"),
      new ExpressionInfo(
        classOf[Sq8ReconExpr].getCanonicalName, "sq8_recon"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "sq8_recon(vec)")
        Sq8ReconExpr(children.head)
      }))
  }
}
