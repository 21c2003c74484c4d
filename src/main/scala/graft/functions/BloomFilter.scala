package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Shared bit math for the bloom pair — kept in one object (with static
  * forwarders) so the interpreted path, the aggregate, and generated Java
  * all run the identical double-hashing scheme.
  */
object BloomUtil {
  /** murmur3 fmix64 — first hash of the double-hashing pair. */
  def mix1(v: Long): Long = {
    var h = v
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** splitmix64 finalizer — independent second hash; forced odd by callers
    * so the probe stride never degenerates.
    */
  def mix2(v: Long): Long = {
    var h = v + 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  def put(words: Array[Long], numHashes: Int, key: Long): Unit = {
    val nBits = words.length * 64L
    val h1 = mix1(key)
    val h2 = mix2(key) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, nBits)
      words((pos >>> 6).toInt) |= 1L << (pos & 63L).toInt
      i += 1
    }
  }

  def mightContain(words: Array[Long], numHashes: Int, key: Long): Boolean = {
    val nBits = words.length * 64L
    val h1 = mix1(key)
    val h2 = mix2(key) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, nBits)
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L)
        return false
      i += 1
    }
    true
  }

  /** Wire layout: [numHashes int][numWords int][words...]. */
  def toBytes(words: Array[Long], numHashes: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * words.length)
    bb.putInt(numHashes).putInt(words.length)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): (Int, Array[Long]) = {
    val bb = ByteBuffer.wrap(bytes)
    val numHashes = bb.getInt()
    val words = new Array[Long](bb.getInt())
    var i = 0
    while (i < words.length) { words(i) = bb.getLong(); i += 1 }
    (numHashes, words)
  }
}

/** Bloom-filter build aggregate (the fourth custom
  * `TypedImperativeAggregate` beside [[KmvSketch]], [[TopKBy]] and
  * [[FreqItemsSketch]]): OR-merges a fixed `numBits` bitset of the keys
  * seen. This is the build side of a runtime semi-join filter: the bitset
  * is a few KB–MB regardless of input size, partials OR map-side, and the
  * merge is trivially commutative/associative, so the filter a driver
  * ships to the probe side is identical under any partitioning.
  *
  * Output: BinaryType — [[BloomUtil.toBytes]] wire layout, consumed by
  * [[BloomMightContain]].
  */
case class BloomFilterAgg(child: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64, s"bloom_agg needs numBits >= 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"bloom_agg needs numHashes in [1, 16], got $numHashes")

  private def numWords: Int = (numBits + 63) / 64

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren.head)

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_agg requires BIGINT input (cast first), got ${t.catalogString}")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.put(buffer, numHashes, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    BloomUtil.toBytes(buffer, numHashes)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    BloomUtil.toBytes(buffer, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomUtil.fromBytes(bytes)._2

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "bloom_agg"
}

/** Probe-side membership test against a driver-held bloom filter (the
  * bytes are a constructor parameter, not a per-row child — the filter is
  * small and fixed once built, exactly like Spark's internal runtime
  * filters). Codegen'd: the generated Java probes the shared long[] words
  * directly, so the prefilter sits inside the scan's WholeStageCodegen
  * span and cuts rows BEFORE any exchange. May return false positives
  * (callers follow with an exact join); never false negatives.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val parsed = BloomUtil.fromBytes(bloomBytes)
  @transient private lazy val numHashes = parsed._1
  @transient private lazy val words = parsed._2

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain requires BIGINT input (cast first), " +
            s"got ${t.catalogString}")
    }

  override def nullSafeEval(key: Any): Any =
    BloomUtil.mightContain(words, numHashes, key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, key => {
      val w = ctx.addReferenceObj("bloomWords", words, "long[]")
      s"${ev.value} = graft.functions.BloomUtil.mightContain($w, $numHashes, $key);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomFilter {
  /** Column API: `bloom_agg(longCol, numBits, numHashes)` → BINARY. */
  def bloom_agg(c: Column, numBits: Int, numHashes: Int = 5): Column =
    GraftBridge.toColumn(
      BloomFilterAgg(GraftBridge.toExpression(c), numBits, numHashes)
        .toAggregateExpression())

  /** Column API: `bloom_might_contain(longCol, bytes)` → BOOLEAN. */
  def bloom_might_contain(c: Column, bloomBytes: Array[Byte]): Column =
    GraftBridge.toColumn(
      BloomMightContain(GraftBridge.toExpression(c), bloomBytes))
}
