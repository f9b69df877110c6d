package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/**
 * Bounded exact top-k aggregate: keeps the `k` LARGEST values of `child`
 * (any orderable type — use a struct for composite orderings) and returns
 * them as a descending array.
 *
 * This is the scale-safe replacement for the
 * `row_number().over(Window.partitionBy(key)).where(rk <= k)` idiom: the
 * window form SORTS an entire key's rows on one task (a hot key = the
 * job's critical path), while this aggregate carries an O(k) buffer
 * through normal partial aggregation — map-side combine trims every
 * partition's contribution to k elements before the shuffle, so the
 * exchange carries at most k rows per (partition, key) no matter how hot
 * the key is.
 *
 * Determinism: ties are decided by the child ordering itself — callers
 * encode the full tie-break into the struct (e.g. `struct(score, -id)`),
 * exactly as they would in a window ORDER BY.
 */
case class TopKAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Any]]
  with UnaryLike[Expression] {

  require(k > 0, s"top_k requires k > 0, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (RowOrderingUtil.isOrderable(child.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"top_k requires an orderable type, got ${child.dataType.catalogString}")
    }

  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)

  override def nullable: Boolean = false

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): ArrayBuffer[Any] =
    new ArrayBuffer[Any](k + 1)

  /** Insert keeping the buffer sorted DESCENDING and trimmed to k. */
  private def insert(buf: ArrayBuffer[Any], v: Any): Unit = {
    if (buf.length == k && ordering.lteq(v, buf.last)) return
    var i = 0
    while (i < buf.length && ordering.gt(buf(i), v)) i += 1
    buf.insert(i, v)
    if (buf.length > k) buf.remove(buf.length - 1)
  }

  override def update(buf: ArrayBuffer[Any],
      input: InternalRow): ArrayBuffer[Any] = {
    val v = child.eval(input)
    if (v != null) insert(buf, InternalRow.copyValue(v))
    buf
  }

  override def merge(buf: ArrayBuffer[Any],
      other: ArrayBuffer[Any]): ArrayBuffer[Any] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.toArray)

  @transient private lazy val bufProjection: UnsafeProjection =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: ArrayBuffer[Any]): Array[Byte] =
    bufProjection
      .apply(InternalRow(new GenericArrayData(buf.toArray)))
      .getBytes

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = new ArrayBuffer[Any](k + 1)
    var i = 0
    while (i < arr.numElements()) {
      buf += InternalRow.copyValue(arr.get(i, child.dataType))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildInternal(newChild: Expression): TopKAgg =
    copy(child = newChild)

  override def prettyName: String = "top_k"
}

/** Orderability check mirroring Catalyst's RowOrdering.isOrderable. */
private[functions] object RowOrderingUtil {
  def isOrderable(dt: DataType): Boolean =
    org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt)
}

object TopKAgg {

  private val info = new ExpressionInfo(
    classOf[TopKAgg].getCanonicalName, "top_k")

  /** Idempotent per-session registration (same pattern as
    * [[ValenceStatsExpr.register]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("top_k"), info,
      (children: Seq[Expression]) => {
        require(children.length == 2 && children(1).foldable &&
          children(1).dataType == IntegerType,
          "top_k(expr, k) requires a literal integer k")
        TopKAgg(children.head,
          children(1).eval().asInstanceOf[Int])
      })

  /** `top_k(e, k)` as an aggregate Column: the k largest values of `e`
    * in descending order. */
  def topK(spark: SparkSession, e: Column, k: Int): Column = {
    register(spark)
    call_function("top_k", e, lit(k))
  }
}
