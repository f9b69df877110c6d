package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Per-document char-k-gram frequency profile in ONE compiled pass:
 * (hash60, count) structs of the DISTINCT code-point k-grams of
 * `lower(text)`, sorted by (count desc, hash asc) — the Cavnar-Trenkle
 * profile order ([[graft.pipeline.DataOps.langIdNgram]]).
 *
 * The composed alternative explodes every gram OCCURRENCE into a row
 * (dim × the scan) and pays a (doc, hash) hash-aggregate shuffle plus a
 * rank stage just to rebuild what one hash map per document already
 * knows; this expression keeps the whole profile build pipelined with
 * the scan — a document's top-K profile is then a codegen `slice`, no
 * shuffle at all.
 *
 * Gram and hash semantics are exactly [[CharGramHashesExpr]]'s
 * (code-point windows of the UTF8String-lowercased text, hash60 = first
 * 15 md5 hex digits). Texts shorter than k yield an empty array.
 */
case class CharGramCountsExpr(child: Expression, k: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_gram_counts requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = CharGramCountsExpr.Schema

  override def nullSafeEval(input: Any): Any =
    CharGramCountsExpr.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharGramCountsExpr$$.MODULE$$" +
        s".compute($c, $k);")

  override protected def withNewChildInternal(
      newChild: Expression): CharGramCountsExpr = copy(child = newChild)

  override def prettyName: String = "char_gram_counts"
}

object CharGramCountsExpr {

  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)

  /** One pass: hash every code-point k-gram ([[CharGramHashesExpr]]
    * semantics), count into a hash map, sort (count desc, hash asc). */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val cps = text.toLowerCase.toString.codePoints().toArray
    val n = cps.length
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new java.util.HashMap[java.lang.Long, Array[Long]](m * 2)
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
      val h = java.lang.Long.valueOf(hi >>> 4)
      val slot = counts.get(h)
      if (slot == null) counts.put(h, Array(1L)) else slot(0) += 1L
      i += 1
    }
    val entries = new Array[(Long, Long)](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      entries(j) = (e.getKey.longValue(), e.getValue()(0))
      j += 1
    }
    java.util.Arrays.sort(entries,
      new java.util.Comparator[(Long, Long)] {
        def compare(a: (Long, Long), b: (Long, Long)): Int = {
          val c = java.lang.Long.compare(b._2, a._2) // count desc
          if (c != 0) c else java.lang.Long.compare(a._1, b._1) // hash asc
        }
      })
    new GenericArrayData(entries.map(e =>
      new GenericInternalRow(Array[Any](e._1, e._2)): Any))
  }

  private val info = new ExpressionInfo(
    classOf[CharGramCountsExpr].getCanonicalName, "char_gram_counts")

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("char_gram_counts"), info,
      (children: Seq[Expression]) => {
        require(children.length == 2 && children(1).foldable &&
          children(1).dataType == IntegerType,
          "char_gram_counts(text, k) requires a literal k")
        val k = children(1).eval().asInstanceOf[Int]
        require(k >= 1, s"char_gram_counts requires k >= 1, got $k")
        CharGramCountsExpr(children.head, k)
      })

  /** (hash60, count) profile of the char k-grams of lower(text). */
  def counts(spark: SparkSession, text: Column, k: Int): Column = {
    register(spark)
    call_function("char_gram_counts", text, lit(k))
  }
}
