package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter semi-join reduction — the standard 100 TB shuffle
  * killer: build a compact bit-set summary of the (post-filter) build
  * side's join keys, broadcast it, and discard probe-side rows that
  * cannot possibly join BEFORE they reach the exchange. False
  * positives only (never false negatives), so an exact join downstream
  * of the pre-filter returns exactly the un-filtered result while the
  * shuffle moves `selectivity + fpp` of the probe side instead of all
  * of it. This is the engine-native form of what AQE's runtime row
  * filtering injects automatically — exposed as a first-class surface
  * so a pipeline can build a filter ONCE and reuse it across queries
  * (e.g. a daily key digest, the d08/t10 broadcast-the-small-set
  * pattern applied to join keys).
  *
  * Hashing: Kirsch–Mitzenmacher double hashing, g_i = h1 + i·h2 with
  * h1/h2 = XXH64(key, seed 42/43) — two hash evaluations serve any
  * number of probe functions with no independence loss.
  *
  * Serialized layout (also the aggregate's output value):
  * [int numHashes][int numBits][bit bytes, LSB-first within a byte].
  */
object BloomBits {
  val Seed1 = 42L
  val Seed2 = 43L
  val HeaderBytes = 8

  def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  def writeInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte
    b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte
    b(off + 3) = v.toByte
  }

  /** Probe a SERIALIZED filter. Static-forwarder friendly: whole-stage
    * codegen calls this directly (`graft.functions.BloomBits.mightContain`),
    * the same shape as Spark's own BloomFilterMightContain. */
  def mightContain(bloom: Array[Byte], key: Long): Boolean = {
    val numHashes = readInt(bloom, 0)
    val numBits = readInt(bloom, 4)
    val h1 = XXH64.hashLong(key, Seed1)
    val h2 = XXH64.hashLong(key, Seed2)
    var i = 0
    while (i < numHashes) {
      val bit = (((h1 + i * h2) % numBits + numBits) % numBits).toInt
      if ((bloom(HeaderBytes + (bit >>> 3)) & (1 << (bit & 7))) == 0)
        return false
      i += 1
    }
    true
  }
}

/** Mutable build-side buffer: the serialized byte layout IS the buffer
  * (merge = bitwise OR over the payload), so serialize/deserialize and
  * eval are allocation-free views of the same array. */
final class BloomBuffer(val bytes: Array[Byte]) {
  def this(numBits: Int, numHashes: Int) = {
    this(new Array[Byte](BloomBits.HeaderBytes + ((numBits + 7) >>> 3)))
    BloomBits.writeInt(bytes, 0, numHashes)
    BloomBits.writeInt(bytes, 4, numBits)
  }

  private def numHashes: Int = BloomBits.readInt(bytes, 0)
  private def numBits: Int = BloomBits.readInt(bytes, 4)

  def add(key: Long): Unit = {
    val nh = numHashes
    val nb = numBits
    val h1 = XXH64.hashLong(key, BloomBits.Seed1)
    val h2 = XXH64.hashLong(key, BloomBits.Seed2)
    var i = 0
    while (i < nh) {
      val bit = (((h1 + i * h2) % nb + nb) % nb).toInt
      bytes(BloomBits.HeaderBytes + (bit >>> 3)) =
        (bytes(BloomBits.HeaderBytes + (bit >>> 3)) | (1 << (bit & 7))).toByte
      i += 1
    }
  }

  def merge(other: BloomBuffer): Unit = {
    require(other.bytes.length == bytes.length &&
        other.numHashes == numHashes && other.numBits == numBits,
      "graft_bloom_agg: cannot merge filters with different geometry")
    var i = BloomBits.HeaderBytes
    while (i < bytes.length) {
      bytes(i) = (bytes(i) | other.bytes(i)).toByte
      i += 1
    }
  }

  def mightContain(key: Long): Boolean = BloomBits.mightContain(bytes, key)
}

/** `graft_bloom_agg(key, numBits, numHashes)` — builds the serialized
  * filter as a BinaryType value. Mergeable (bitwise OR), so partial
  * aggregation runs map-side and the shuffle carries one fixed-size
  * bit array per partition regardless of build-side row count. */
case class BloomFilterAggregate(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_agg: key must be BIGINT, got " +
          s"${child.dataType.simpleString} — cast the input")
    else if (numBits < 8 || numBits > (1 << 30))
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_agg: numBits must be in [8, 2^30], got $numBits")
    else if (numHashes < 1 || numHashes > 16)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_agg: numHashes must be in [1, 16], got $numHashes")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): BloomBuffer =
    new BloomBuffer(numBits, numHashes)

  override def update(buf: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: BloomBuffer, b: BloomBuffer): BloomBuffer = {
    a.merge(b)
    a
  }

  override def eval(buf: BloomBuffer): Any = buf.bytes

  override def serialize(buf: BloomBuffer): Array[Byte] = buf.bytes
  override def deserialize(bytes: Array[Byte]): BloomBuffer =
    new BloomBuffer(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomFilterAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `graft_bloom_contains(bloom, key)` — probe a serialized filter.
  * Codegen emits a static call, keeping the probe inside whole-stage
  * codegen on the scan it guards. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains: expected (BINARY bloom, BIGINT key), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(bloom: Any, key: Any): Any =
    BloomBits.mightContain(bloom.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bloom, key) =>
      s"${ev.value} = graft.functions.BloomBits.mightContain($bloom, $key);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomFunctions {
  /** Build a serialized Bloom filter over a BIGINT key column. */
  def bloomAgg(key: Column, numBits: Int, numHashes: Int): Column =
    GraftBridge.column(BloomFilterAggregate(
      GraftBridge.expression(key), numBits, numHashes)
      .toAggregateExpression())

  /** Probe: false means the key is DEFINITELY absent. */
  def bloomContains(bloom: Column, key: Column): Column =
    GraftBridge.column(BloomMightContain(
      GraftBridge.expression(bloom), GraftBridge.expression(key)))
}
