package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Dense-ID exact-distinct bitmap — the EXACT counterpart to the HLL
  * register sketch (q114/q126), for the warehouse case where the key is
  * a bounded surrogate/dictionary id (custkey, partkey, user id): one
  * bit per key, merge is bitwise OR, and set ALGEBRA stays exact —
  * `bitmap_and_count` intersects two groups' audiences without
  * rescanning the fact table, the groupBitmap/Roaring pattern from the
  * ClickHouse/Druid world (here an uncompressed word array: the graft
  * corpus keys are dense, and compression is an encoding concern this
  * surface deliberately leaves to the serialized BINARY value).
  *
  * The guard rails make misuse loud instead of slow: keys must be in
  * [0, 10^8] — a 60-bit hash fed by mistake throws immediately with a
  * pointer to `hll_register_agg` (the sketch for unbounded key spaces)
  * rather than allocating gigabytes.
  *
  * Scale shape: the aggregate's partial state is ⌈maxKey/64⌉ words per
  * group map-side — for a 10^6-customer dictionary that is 125 KB per
  * group however many fact rows fold in, and the exchange carries one
  * bitmap per (partition, group). Reference delegates all of this to
  * user code behind its processor seam
  * (`/root/reference/README.md:246-293`).
  */
final class BitmapBuffer(initialWords: Array[Long]) {
  def this() = this(new Array[Long](1))
  private var words: Array[Long] = initialWords

  private def ensure(widx: Int): Unit =
    if (widx >= words.length) {
      val n = java.lang.Integer.highestOneBit(widx) << 1
      words = java.util.Arrays.copyOf(words, math.max(n, widx + 1))
    }

  def add(k: Long): Unit = {
    if (k < 0L || k > BitmapBuffer.MaxKey)
      throw new IllegalArgumentException(
        s"bitmap_agg: key $k outside [0, ${BitmapBuffer.MaxKey}] — the " +
          "dense-ID bitmap is for bounded surrogate keys; use " +
          "hll_register_agg for hashed/unbounded key spaces")
    val widx = (k >>> 6).toInt
    ensure(widx)
    words(widx) |= 1L << (k & 63L)
  }

  def orWith(b: BitmapBuffer): Unit = {
    ensure(b.words.length - 1)
    var i = 0
    while (i < b.words.length) { words(i) |= b.words(i); i += 1 }
  }

  /** Serialized form: the words as big-endian bytes, trimmed to the
    * last non-zero word (so equal SETS serialize identically no matter
    * the growth history — the value is hash-comparable). */
  def bytes: Array[Byte] = {
    var last = words.length - 1
    while (last >= 0 && words(last) == 0L) last -= 1
    val bb = java.nio.ByteBuffer.allocate((last + 1) * 8)
    var i = 0
    while (i <= last) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }
}

object BitmapBuffer {
  val MaxKey = 100000000L

  def fromBytes(bytes: Array[Byte]): BitmapBuffer = {
    val words = new Array[Long](math.max(1, bytes.length / 8))
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < bytes.length / 8) { words(i) = bb.getLong(); i += 1 }
    new BitmapBuffer(words)
  }

  def count(bytes: Array[Byte]): Long = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var c = 0L
    var i = 0
    while (i < bytes.length / 8) {
      c += java.lang.Long.bitCount(bb.getLong()); i += 1
    }
    c
  }

  def andCount(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length) / 8
    val ba = java.nio.ByteBuffer.wrap(a)
    val bc = java.nio.ByteBuffer.wrap(b)
    var c = 0L
    var i = 0
    while (i < n) {
      c += java.lang.Long.bitCount(ba.getLong() & bc.getLong()); i += 1
    }
    c
  }
}

/** `bitmap_agg(key)` — the serialized exact-distinct bitmap of a group
  * of bounded non-negative BIGINT ids, as a BinaryType value. */
case class BitmapAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitmap_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bitmap_agg: key must be BIGINT, got " +
          s"${child.dataType.simpleString} — cast the input")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): BitmapBuffer = new BitmapBuffer()

  override def update(buf: BitmapBuffer, input: InternalRow): BitmapBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: BitmapBuffer, b: BitmapBuffer): BitmapBuffer = {
    a.orWith(b)
    a
  }

  override def eval(buf: BitmapBuffer): Any = buf.bytes

  override def serialize(buf: BitmapBuffer): Array[Byte] = buf.bytes
  override def deserialize(bytes: Array[Byte]): BitmapBuffer =
    BitmapBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BitmapAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `bitmap_count(bitmap)` — exact cardinality of a serialized bitmap.
  * Codegen emits a static call (the graft_bloom_contains stance). */
case class BitmapCount(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bitmap_count: expected BINARY, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(b: Any): Any =
    BitmapBuffer.count(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.BitmapBuffer.count($b)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** `bitmap_and_count(a, b)` — exact cardinality of the intersection of
  * two serialized bitmaps: cross-group set algebra without touching
  * the fact table again. */
case class BitmapAndCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_and_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || right.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bitmap_and_count: expected (BINARY, BINARY), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(a: Any, b: Any): Any =
    BitmapBuffer.andCount(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.BitmapBuffer.andCount($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BitmapFunctions {
  def bitmapAgg(key: Column): Column =
    GraftBridge.column(BitmapAggregate(GraftBridge.expression(key))
      .toAggregateExpression())
  def bitmapCount(b: Column): Column =
    GraftBridge.column(BitmapCount(GraftBridge.expression(b)))
  def bitmapAndCount(a: Column, b: Column): Column =
    GraftBridge.column(BitmapAndCount(GraftBridge.expression(a),
      GraftBridge.expression(b)))
}
