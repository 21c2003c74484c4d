package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded top-k buffer: the k pairs with the SMALLEST `ord` values seen,
  * held as a max-heap (largest retained ord at the head) so insertion is
  * O(log k) and eviction is O(1). Values are defensive copies (Catalyst
  * reuses row/buffer memory between `update` calls).
  */
final class TopKBuffer(val k: Int, ordering: Ordering[Any]) {
  val heap = new java.util.PriorityQueue[(Any, Any)](
    math.max(k, 1),
    (a: (Any, Any), b: (Any, Any)) => ordering.compare(b._1, a._1))

  def insert(ord: Any, payload: Any): Unit = {
    if (heap.size < k) { heap.add((ord, payload)); () }
    else if (ordering.compare(ord, heap.peek()._1) < 0) {
      heap.poll(); heap.add((ord, payload)); ()
    }
  }

  /** Insert with deferred materialization: `rawOrd` (which may be backed
    * by Catalyst's reused row buffers) is only COMPARED, never retained;
    * the defensive copies — and the payload evaluation itself — run only
    * when the pair actually enters the heap. After the heap warms up the
    * overwhelming majority of rows are rejected, and this makes each
    * rejection a single compare with zero allocation.
    */
  def insertLazy(rawOrd: Any, copyOrd: () => Any,
      copyPayload: () => Any): Unit = {
    if (heap.size < k) { heap.add((copyOrd(), copyPayload())); () }
    else if (ordering.compare(rawOrd, heap.peek()._1) < 0) {
      heap.poll(); heap.add((copyOrd(), copyPayload())); ()
    }
  }
}

/** Per-group top-k rows as a custom Catalyst `TypedImperativeAggregate` —
  * the two-stage replacement for the `row_number() OVER (PARTITION BY …
  * ORDER BY …) <= k` window pattern. The window form SORTS every row of
  * every key inside one reducer partition per key; this aggregate keeps a
  * bounded O(k) heap per group, partials combine map-side
  * (ObjectHashAggregate), and merges are associative — so the shuffle
  * moves k rows per key per partition instead of all of them. At 100 TB
  * with a hot key this is the difference between one reducer sorting the
  * key's entire row set and a tree of O(k) merges.
  *
  * Semantics: retains the `k` pairs with the SMALLEST `ord` values under
  * the natural (ascending, nulls-ordered) interpreted ordering of `ord`'s
  * type; encode descending dimensions by negating them in the `ord`
  * struct (the same contract [[graft.ext.corpus.Corpus.tfidfTopTerms]]
  * documents) or set `reverse = true` to keep the k LARGEST (used by the
  * [[graft.plans.TopKPerKeyRewrite]] optimizer rule for DESC sorts over
  * types negation can't express, e.g. strings); include a unique
  * tiebreaker for determinism. Rows with a NULL `ord` are skipped (window
  * `row_number` ranks them; a top-k contract over nulls is meaningless —
  * rewrite callers encode null rank into a non-null flag field instead).
  * Output: `array<payloadType>` sorted by the effective ordering, best
  * first — `posexplode` recovers the rank.
  */
case class TopKBy(payload: Expression, ord: Expression, k: Int,
    reverse: Boolean = false,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1, s"top_k_by needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(payload, ord)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBy =
    copy(payload = newChildren(0), ord = newChildren(1))

  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(payload.dataType, containsNull = payload.nullable)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(ord.dataType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_by ordering type ${ord.dataType.catalogString} is not orderable")
    }

  // `reverse` flips the effective ordering: keep the k LARGEST, array
  // sorted descending — so index 0 is always "rank 1" either way
  @transient private lazy val ordering: Ordering[Any] = {
    val base = TypeUtils.getInterpretedOrdering(ord.dataType)
    if (reverse) base.reverse else base
  }

  // serialization: each (ord, payload) pair becomes one UnsafeRow
  @transient private lazy val pairProj =
    UnsafeProjection.create(Array[DataType](ord.dataType, payload.dataType))
  @transient private lazy val pairRow = new GenericInternalRow(2)

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(k, ordering)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = ord.eval(input)
    if (o != null) {
      buffer.insertLazy(o, () => InternalRow.copyValue(o),
        () => InternalRow.copyValue(payload.eval(input)))
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) { val p = it.next(); buffer.insert(p._1, p._2) }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val arr = buffer.heap.toArray(new Array[(Any, Any)](buffer.heap.size))
    java.util.Arrays.sort(arr,
      (a: (Any, Any), b: (Any, Any)) => ordering.compare(a._1, b._1))
    new GenericArrayData(arr.map(_._2))
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val rows = new scala.collection.mutable.ArrayBuffer[Array[Byte]](
      buffer.heap.size)
    val it = buffer.heap.iterator()
    while (it.hasNext) {
      val p = it.next()
      pairRow.update(0, p._1)
      pairRow.update(1, p._2)
      // copy() first: getBytes returns the projection's SHARED backing
      // array (no copy) whenever sizeInBytes exactly equals the reused
      // writer buffer's length — a payload whose var-length section
      // exactly fills the headroom would be aliased and overwritten by
      // the next projected pair, corrupting the shuffle bytes
      rows += pairProj(pairRow).copy().getBytes
    }
    val bb = ByteBuffer.allocate(8 + rows.map(_.length + 4).sum)
    bb.putInt(buffer.k).putInt(rows.length)
    rows.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt(), ordering)
    val n = bb.getInt()
    val row = new UnsafeRow(2)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      row.pointTo(arr, len)
      buf.insert(InternalRow.copyValue(row.get(0, ord.dataType)),
        InternalRow.copyValue(row.get(1, payload.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "top_k_by"
}

object TopKBy {
  /** Column API: `top_k_by(payload, ord, k)` → `array<payloadType>` of the
    * k payloads with the smallest `ord`, sorted ascending by `ord`.
    */
  def top_k_by(payload: Column, ord: Column, k: Int): Column =
    GraftBridge.toColumn(
      TopKBy(GraftBridge.toExpression(payload),
        GraftBridge.toExpression(ord), k).toAggregateExpression())
}
