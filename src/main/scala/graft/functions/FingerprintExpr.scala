package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused document-fingerprint expression: lowercase → char-5-gram →
 * hash60 → distinct → 4 smallest → md5 of the joined values, all in ONE
 * compiled pass per document (the winnowing-style min-sketch of
 * [[graft.pipeline.DataOps.fingerprintCols]]).
 *
 * Replaces a FIVE-lambda composition (`transform(sequence)` for the
 * gram windows, `transform(hash60)`, `array_distinct`/`array_sort`,
 * `transform(cast)` + `array_join`) — every one CodegenFallback, all
 * sitting directly over the documents SCAN (CodegenLintSpec's largest
 * single finding set).
 *
 * Semantics are bit-identical to the composed form: grams are CODE
 * POINT windows of the UTF8String-lowercased text (`lower` +
 * `substr`/`length` count code points, not UTF-16 units),
 * hash60(g) = first 15 hex digits of md5(utf8(g)) as BIGINT, `fp` =
 * lowercase-hex md5 of the 4 smallest distinct hashes joined by "," as
 * decimal strings (md5 of "" when the text has no 5-gram), `n_grams` =
 * distinct gram-hash count.
 */
case class FingerprintExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"doc_fingerprint requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = FingerprintExpr.Schema

  override def nullSafeEval(input: Any): Any =
    FingerprintExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FingerprintExpr$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): FingerprintExpr = copy(child = newChild)

  override def prettyName: String = "doc_fingerprint"
}

object FingerprintExpr {

  val Schema: StructType = StructType(Seq(
    StructField("fp", StringType, nullable = false),
    StructField("n_grams", LongType, nullable = false)))

  private val HexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest,
      s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** first 60 bits of md5(utf8(s)) — [[HashFns.hash60]]'s value. */
  private def hash60(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hi =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    hi >>> 4
  }

  /** One pass: code-point 5-gram hashes, distinct, 4 smallest → md5. */
  def compute(text: UTF8String): InternalRow = {
    val md = java.security.MessageDigest.getInstance("MD5")
    // UTF8String.toLowerCase IS what Spark's lower() runs — identical
    // ASCII fast path / locale behavior by construction.
    val cps = text.toLowerCase.toString.codePoints().toArray
    val n = cps.length
    val seen = new java.util.HashSet[java.lang.Long]()
    if (n >= 5) {
      var i = 0
      while (i <= n - 5) {
        seen.add(java.lang.Long.valueOf(
          hash60(md, new String(cps, i, 5))))
        i += 1
      }
    }
    val hs = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { hs(k) = it.next().longValue(); k += 1 }
    java.util.Arrays.sort(hs)
    val take = math.min(4, hs.length)
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j < take) {
      if (j > 0) sb.append(',')
      sb.append(hs(j))
      j += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(md5Hex(md, sb.toString)), hs.length.toLong))
  }

  private val info = new ExpressionInfo(
    classOf[FingerprintExpr].getCanonicalName, "doc_fingerprint")

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("doc_fingerprint"), info,
      (children: Seq[Expression]) => {
        require(children.length == 1, "doc_fingerprint(text)")
        FingerprintExpr(children.head)
      })

  /** The fingerprint struct of a text column. */
  def fp(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("doc_fingerprint", text)
  }
}
