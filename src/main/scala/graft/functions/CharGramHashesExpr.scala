package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Position-ordered char-k-gram hash60 array of the lowercased text —
 * the POSITIONAL sibling of [[FingerprintExpr]]'s distinct min-sketch,
 * and the gram feed of [[graft.pipeline.DataOps.winnowing]] (which
 * needs every gram's position, not just the 4 smallest hashes).
 *
 * One compiled pass per document; the composed alternative
 * (`transform(sequence(...), i -> hash60(substr(...)))`) is a
 * CodegenFallback lambda over the documents scan — the exact failure
 * class CodegenLintSpec guards against.
 *
 * Semantics (bit-identical to the DuckDB mirror): grams are CODE POINT
 * windows of `lower(text)` (`substr`/`length` count code points, not
 * UTF-16 units — the [[FingerprintExpr]] discipline), element j is
 * hash60 of the k-gram starting at code point j (0-based),
 * hash60(g) = first 15 hex digits of md5(utf8(g)) as BIGINT. Texts
 * shorter than k code points yield an empty array.
 */
case class CharGramHashesExpr(child: Expression, k: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_gram_hashes requires string, got ${other.catalogString}")
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CharGramHashesExpr.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharGramHashesExpr$$.MODULE$$" +
        s".compute($c, $k);")

  override protected def withNewChildInternal(
      newChild: Expression): CharGramHashesExpr = copy(child = newChild)

  override def prettyName: String = "char_gram_hashes"
}

object CharGramHashesExpr {

  /** One pass: lowercase (UTF8String.toLowerCase IS what Spark's
    * `lower()` runs), code-point k-windows, hash60 each (one
    * MessageDigest reused across grams). */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val cps = text.toLowerCase.toString.codePoints().toArray
    val n = cps.length
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      md.reset()
      val d = md.digest(new String(cps, i, k).getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      val hi =
        ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      out(i) = hi >>> 4
      i += 1
    }
    new GenericArrayData(out)
  }

  private val info = new ExpressionInfo(
    classOf[CharGramHashesExpr].getCanonicalName, "char_gram_hashes")

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("char_gram_hashes"), info,
      (children: Seq[Expression]) => {
        require(children.length == 2 && children(1).foldable &&
          children(1).dataType == IntegerType,
          "char_gram_hashes(text, k) requires a literal k")
        val k = children(1).eval().asInstanceOf[Int]
        require(k >= 1, s"char_gram_hashes requires k >= 1, got $k")
        CharGramHashesExpr(children.head, k)
      })

  /** hash60 of every char k-gram of lower(text), in position order. */
  def gramHashes(spark: SparkSession, text: Column, k: Int): Column = {
    register(spark)
    call_function("char_gram_hashes", text, lit(k))
  }
}
