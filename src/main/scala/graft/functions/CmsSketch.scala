package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch state: a `depth × width` grid of counters, row-major.
  * Row `r`'s hash for a key is byte `r` of the key's portable MD5-low-64
  * (`width` must divide 256 so a byte slice is uniform over the cells).
  */
final class CmsBuffer(val depth: Int, val width: Int) {
  val cells = new Array[Long](depth * width)

  def add(h64: Long, n: Long): Unit = {
    var r = 0
    while (r < depth) {
      cells(r * width + (((h64 >>> (8 * r)) & 0xffL) % width).toInt) += n
      r += 1
    }
  }
}

/** Count-min sketch aggregate (Cormode & Muthukrishnan 2005) — the
  * classic streaming frequency sketch, as a custom Catalyst
  * `TypedImperativeAggregate`: per group, O(depth·width) counters
  * regardless of input size, map-side partials, associative elementwise
  * merges. A key's frequency estimate is `min` over rows `r` of
  * `cells[r][h_r(key)]` — never an undercount, overcount bounded by
  * collisions (ε ≈ e/width with probability 1−(1/2)^depth). Where
  * Misra-Gries ([[FreqItemsSketch]]) answers "what are the heavy keys",
  * CMS answers point-frequency queries for ANY key after one pass.
  *
  * Spark ships `count_min_sketch(...)` (and `spark-sketch`'s
  * `CountMinSketch` class) with an engine-private hash family; this
  * variant exists so the sketch is CROSS-ENGINE REPLAYABLE: row `r`
  * hashes a key with byte `r` of the portable MD5-low-64
  * ([[SimHash64.md5Low64]], bit-equal to DuckDB `md5` arithmetic), all
  * integer — so an oracle can rebuild the ENTIRE grid and every
  * estimate, and the gate compares sketch CONTENTS, not a tolerance
  * contract (same policy as [[KmvSketch]]/q23). Byte slices of one MD5
  * are the `depth` pairwise-independent row hashes (depth ≤ 8 by
  * construction; width must divide 256).
  *
  * Output: `array<bigint>` of the row-major grid — probe declaratively
  * with `element_at(grid, r·width + h_r(key) + 1)`, no driver collect,
  * no UDF.
  */
case class CmsSketch(child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmsBuffer] {

  require(depth >= 1 && depth <= 8,
    s"cms depth must be in [1, 8] (one md5 byte per row), got $depth")
  require(width >= 2 && 256 % width == 0,
    s"cms width must divide 256 (byte-slice uniformity), got $width")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(child = newChildren.head)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cms_sketch requires STRING input (cast first), got ${t.catalogString}")
    }

  // one digest per (deserialized, per-task) instance — same pattern as
  // SimHash64; never shared across threads
  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")

  override def createAggregationBuffer(): CmsBuffer =
    new CmsBuffer(depth, width)

  override def update(buffer: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) {
      buffer.add(
        SimHash64.md5Low64(md5, v.asInstanceOf[UTF8String].getBytes), 1L)
    }
    buffer
  }

  override def merge(buffer: CmsBuffer, other: CmsBuffer): CmsBuffer = {
    var i = 0
    while (i < buffer.cells.length) {
      buffer.cells(i) += other.cells(i); i += 1
    }
    buffer
  }

  override def eval(buffer: CmsBuffer): Any =
    new GenericArrayData(buffer.cells.clone())

  override def serialize(buffer: CmsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buffer.cells.length)
    bb.putInt(buffer.depth).putInt(buffer.width)
    var i = 0
    while (i < buffer.cells.length) { bb.putLong(buffer.cells(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CmsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CmsBuffer(bb.getInt(), bb.getInt())
    var i = 0
    while (i < buf.cells.length) { buf.cells(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "cms_sketch"
}

object CmsSketch {
  /** Column API: `cms_sketch(stringCol, depth, width)` → row-major
    * `array<bigint>` grid of depth·width counters.
    */
  def cms_sketch(c: Column, depth: Int, width: Int): Column =
    GraftBridge.toColumn(
      CmsSketch(GraftBridge.toExpression(c), depth, width)
        .toAggregateExpression())
}
