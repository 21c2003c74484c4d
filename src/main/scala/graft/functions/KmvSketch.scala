package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded buffer of the `k` smallest (unsigned) 64-bit hashes seen —
  * a KMV (k-minimum-values) sketch. Inserts dedupe; the tree stays ≤ k.
  */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long](
    (a: java.lang.Long, b: java.lang.Long) =>
      java.lang.Long.compareUnsigned(a, b))

  def insert(h: Long): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, set.last) < 0) {
      if (set.add(h)) { set.pollLast(); () }
    }
  }
}

/** KMV (k-minimum-values) sketch aggregate — a custom Catalyst
  * `TypedImperativeAggregate`: per group, keep the `k` smallest unsigned
  * 64-bit hashes of the input strings. The k-th minimum estimates the
  * distinct count as `(k-1)·2⁶⁴ / kth` (Bar-Yossef et al.), and the kept
  * hashes double as a deterministic, mergeable bottom-k-by-hash sample.
  *
  * Scale shape: the buffer is O(k) per group regardless of input size,
  * partials combine map-side (ObjectHashAggregate), and merges are
  * associative/commutative — the canonical mergeable-sketch contract.
  * Hashing is the portable MD5-low-64 ([[SimHash64.md5Low64]], bit-equal
  * to DuckDB `md5_number_lower`), so the whole sketch — not just its
  * estimate — is oracle-checkable across engines.
  *
  * Output: `struct(nd INT, kth BIGINT)` — the number of (distinct) hashes
  * retained and the k-th minimum's raw bits, `kth` null while the group
  * has fewer than `k` distinct values (the sketch is then exact: `nd` IS
  * the distinct count, barring a 64-bit collision).
  */
case class KmvSketch(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 2, s"kmv sketch needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("nd", IntegerType, nullable = false),
    StructField("kth", LongType, nullable = true)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv_sketch requires STRING input (cast first), got ${t.catalogString}")
    }

  // one digest per (deserialized, per-task) instance — same pattern as
  // SimHash64; never shared across threads
  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) {
      buffer.insert(
        SimHash64.md5Low64(md5, v.asInstanceOf[UTF8String].getBytes))
    }
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) buffer.insert(it.next())
    buffer
  }

  override def eval(buffer: KmvBuffer): Any = {
    val nd = buffer.set.size
    val kth: Any = if (nd >= k) buffer.set.last else null
    InternalRow(nd, kth)
  }

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buffer.set.size)
    bb.putInt(buffer.k).putInt(buffer.set.size)
    val it = buffer.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.insert(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "kmv_sketch"
}

object KmvSketch {
  /** Column API: `kmv_sketch(stringCol, k)` → struct(nd, kth). */
  def kmv_sketch(c: Column, k: Int): Column =
    GraftBridge.toColumn(
      KmvSketch(GraftBridge.toExpression(c), k).toAggregateExpression())
}
