package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra–Gries frequency summary: at most `k` (item → counter) entries.
  * When a new item arrives at capacity, every counter decrements by one
  * (zeros evicted) and `err` — the largest possible undercount of any
  * stored counter — increments. Any item with true frequency > n/(k+1) is
  * guaranteed to survive.
  */
final class FreqBuffer(val k: Int) {
  val counts = new java.util.HashMap[Long, Long]()
  var err: Long = 0L

  def add(item: Long, by: Long): Unit = {
    if (counts.containsKey(item)) { counts.put(item, counts.get(item) + by); () }
    else if (counts.size < k) { counts.put(item, by); () }
    else {
      // weighted decrement-all, capped at the smallest stored counter so
      // no counter goes negative; the evicted slot absorbs any remainder
      // (for the classic by == 1 stream this is exactly one decrement)
      var minC = Long.MaxValue
      val it = counts.values().iterator()
      while (it.hasNext) minC = math.min(minC, it.next())
      val dec = math.min(by, minC)
      val entries = counts.entrySet().iterator()
      while (entries.hasNext) {
        val e = entries.next()
        val nv = e.getValue - dec
        if (nv <= 0) entries.remove() else e.setValue(nv)
      }
      err += dec
      if (by - dec > 0) add(item, by - dec)
    }
  }
}

/** Heavy-hitters aggregate — a Misra–Gries summary as a custom Catalyst
  * `TypedImperativeAggregate` (the third in this engine, beside
  * [[KmvSketch]] and [[TopKBy]]): per group, a bounded map of at most `k`
  * (item, counter) pairs plus the summary's error bound.
  *
  * Scale shape: O(k) state per group regardless of input size (a plain
  * `groupBy(group, item).count` materializes EVERY distinct item — at
  * 100 TB, finding the top sources per partition key must not shuffle one
  * row per distinct item); partials combine map-side under
  * ObjectHashAggregate, and the merge replays the other summary's
  * counters as weighted inserts (see [[merge]]) — a mergeable-summaries
  * scheme, so the guarantee survives arbitrary partitioning.
  *
  * Guarantees: for every item, `stored ≤ true ≤ stored + err`; any item
  * with true frequency > n/(k+1) is present. When the group's distinct
  * item count never exceeds `k`, no decrement ever fires: `err == 0` and
  * every counter is EXACT — the regime the driver gate runs in, making
  * the summary fully oracle-comparable. In the lossy regime stored counts
  * are order-dependent (as with any MG summary); only the bounds are
  * contractual — FreqItemsSpec asserts them.
  *
  * Output: `struct(err BIGINT, items ARRAY<STRUCT<item BIGINT,
  * count BIGINT>>)`, items sorted by (count DESC, item ASC) so prefixes
  * are deterministic top-k slices in the exact regime.
  */
case class FreqItemsSketch(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqBuffer] {

  require(k >= 1, s"freq_items needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsSketch =
    copy(child = newChildren.head)

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("err", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", LongType, nullable = false),
      StructField("count", LongType, nullable = false))),
      containsNull = false), nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"freq_items requires BIGINT input (cast first), got ${t.catalogString}")
    }

  override def createAggregationBuffer(): FreqBuffer = new FreqBuffer(k)

  override def update(buffer: FreqBuffer, input: InternalRow): FreqBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long], 1L)
    buffer
  }

  /** Merge = replay the other side's counters as WEIGHTED inserts (each
    * may trigger capped decrement-all rounds when at capacity), then
    * accumulate the other side's own error bound. This is the weighted-
    * update formulation of a mergeable MG summary — equivalent bounds to
    * the Agarwal et al. "add all, subtract the (k+1)-th largest" rule
    * (stored ≤ true ≤ stored + err survives either way; exact-regime
    * results are identical), but lossy-regime stored counters may differ
    * between the two formulations.
    */
  override def merge(buffer: FreqBuffer, other: FreqBuffer): FreqBuffer = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buffer.add(e.getKey, e.getValue)
    }
    buffer.err += other.err
    buffer
  }

  override def eval(buffer: FreqBuffer): Any = {
    val arr = new Array[(Long, Long)](buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      arr(i) = (e.getKey, e.getValue)
      i += 1
    }
    val sorted = arr.sortBy { case (item, c) => (-c, item) }
    InternalRow(buffer.err,
      new GenericArrayData(sorted.map { case (item, c) =>
        InternalRow(item, c): Any
      }))
  }

  override def serialize(buffer: FreqBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 + 4 + 16 * buffer.counts.size)
    bb.putInt(buffer.k).putLong(buffer.err).putInt(buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey).putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new FreqBuffer(bb.getInt())
    buf.err = bb.getLong()
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.counts.put(bb.getLong(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "freq_items_sketch"
}

object FreqItems {
  /** Column API: `freq_items(longCol, k)` → struct(err, items). */
  def freq_items(c: Column, k: Int): Column =
    GraftBridge.toColumn(
      FreqItemsSketch(GraftBridge.toExpression(c), k).toAggregateExpression())
}
