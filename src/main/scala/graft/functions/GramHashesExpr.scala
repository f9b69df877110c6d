package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused word-n-gram 60-bit-hash expression: tokenize → slide the
 * n-window → (optional first-occurrence distinct) → MD5-prefix hash60,
 * all in ONE compiled pass per document.
 *
 * Replaces `transform(word_grams(text, n, d), g → hash60(g))`: the
 * `transform` lambda is CodegenFallback (the [[WordGramsExpr]] /
 * [[VecDotExpr]] failure class), so the decontamination operators paid
 * interpreted evaluation per row on their hottest projection.
 *
 * Semantics are bit-identical to the composed form: tokens are maximal
 * non-empty runs between single spaces, a gram is n tokens joined by one
 * space, `distinct` keeps first occurrences (dedup happens on the GRAM,
 * before hashing — two distinct grams colliding on hash60 still emit two
 * equal hashes, exactly like the composed pipeline), and
 * hash60(s) = first 15 hex digits of md5(utf8(s)) as a BIGINT
 * (computed here as the first 60 bits of the digest — the same value
 * [[HashFns.hash60]] and the DuckDB oracles produce).
 */
case class GramHashesExpr(child: Expression, n: Int, distinct: Boolean)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_gram_hashes requires string, got ${other.catalogString}")
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    GramHashesExpr.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramHashesExpr$$.MODULE$$" +
        s".compute($c, $n, $distinct);")

  override protected def withNewChildInternal(
      newChild: Expression): GramHashesExpr = copy(child = newChild)

  override def prettyName: String = "word_gram_hashes"
}

object GramHashesExpr {

  /** One pass: tokenize on 0x20, slide the n-window, optional distinct,
    * hash60 each gram (one MessageDigest reused across grams). */
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
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
    val m = words.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
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
        md.reset()
        val d = md.digest(gram.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        // first 15 hex digits of the digest == the first 60 bits: the
        // unsigned big-endian long of bytes 0..7, shifted right 4
        val hi =
          ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
          ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
          ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        out.add(hi >>> 4)
      }
      k += 1
    }
    new GenericArrayData(out.toArray)
  }

  private val info = new ExpressionInfo(
    classOf[GramHashesExpr].getCanonicalName, "word_gram_hashes")

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("word_gram_hashes"), info,
      (children: Seq[Expression]) => {
        require(children.length == 3 && children(1).foldable &&
          children(1).dataType == IntegerType && children(2).foldable &&
          children(2).dataType == BooleanType,
          "word_gram_hashes(text, n, distinct) requires literal n/distinct")
        val n = children(1).eval().asInstanceOf[Int]
        require(n >= 1, s"word_gram_hashes requires n >= 1, got $n")
        GramHashesExpr(children.head, n,
          children(2).eval().asInstanceOf[Boolean])
      })

  /** hash60 of the word n-grams of a text column. */
  def gramHashes(spark: SparkSession, text: Column, n: Int,
      distinct: Boolean): Column = {
    register(spark)
    call_function("word_gram_hashes", text, lit(n), lit(distinct))
  }
}
