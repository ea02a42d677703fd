package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** HyperLogLog register file as a Catalyst `TypedImperativeAggregate` —
  * the ENGINE-SURFACE form of the sketch q114/q124 build declaratively
  * (group-by-bucket max over rho columns): one SQL-registered aggregate
  * a user calls as `hll_register_agg(h)` instead of spelling out the
  * bucket/rho algebra per query. Same register semantics BIT-FOR-BIT
  * (pinned in spec against q114's group-by construction): over the
  * portable 60-bit md5-prefix hash, bucket = h & 63, rho = leading-zero
  * rank of the remaining 54 bits (55 − bitlen(w), 55 when w = 0, so
  * rho ∈ [1, 55]), register = max rho per bucket. The per-group state
  * is the 64-byte register array itself; update is two shifts + a max,
  * merge is element-wise max (HLL's defining property — partial
  * aggregation runs map-side and register files from any partitioning
  * of history fold to the identical sketch), eval emits the 64
  * registers as ARRAY<INT> with 0 marking a never-hit bucket (rho ≥ 1,
  * so 0 is unambiguous; the indicator sum Σ2^(55−m) then treats empty
  * buckets algebraically, exactly as q114's z does).
  *
  * The estimate stays OUTSIDE the aggregate on purpose: α·m²/Z is one
  * shared-literal double expression the caller projects (q126), so the
  * sketch surface this aggregate owns is the deterministic, mergeable,
  * oracle-checkable part — the reference delegates all sketching to
  * user code behind its processor seam
  * (`/root/reference/README.md:246-293`).
  *
  * A negative input throws: the portable hash family is non-negative
  * 60-bit by construction, and Java's `>>` on a negative long would
  * smear sign bits into rho — a silently wrong register beats nothing
  * loudly (the AffineMinHashSignature stance).
  */
case class HllRegisterAggregate(
    hashExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val Buckets = 64

  override def children: Seq[Expression] = Seq(hashExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_register_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (hashExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"hll_register_agg: hash must be BIGINT, got " +
          s"${hashExpr.dataType.simpleString} — cast the input")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](Buckets)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val h = hashExpr.eval(input)
    if (h != null) HllRegisterAggregate.observe(buf, h.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < Buckets) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](Buckets)
    var i = 0
    while (i < Buckets) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(
      newOffset: Int): HllRegisterAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): HllRegisterAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegisterAggregate =
    copy(hashExpr = newChildren(0))
}

object HllRegisterAggregate {
  /** Fold one hash into a 64-byte register file in place — the single
    * source of the bucket/rho algebra, shared by the batch aggregate
    * and the streaming fold (StreamingOps.hllFold) so the two surfaces
    * cannot drift. */
  def observe(regs: Array[Byte], hv: Long): Unit = {
    if (hv < 0L) throw new IllegalArgumentException(
      s"hll_register_agg: negative hash $hv — the register algebra is " +
        "defined over the non-negative 60-bit portable hash family; " +
        "a sign bit would smear into every rho")
    val bucket = (hv & 63L).toInt
    val w = hv >>> 6
    // 55 − bitlen(w); bitlen(0) treated as 0 gives rho = 55
    val rho = 55 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (rho > regs(bucket)) regs(bucket) = rho.toByte
  }

  /** Raw α·m²/Z estimate from a register file — the identical IEEE
    * expression q114/q126 project declaratively. */
  def estimate(regs: Array[Byte]): Double = {
    var z = 0L
    var i = 0
    while (i < regs.length) { z += 1L << (55 - regs(i)); i += 1 }
    0.709365049 * 4096.0 * 36028797018963968.0 / z.toDouble
  }
}

object HllFunctions {
  /** 64-register HLL file of a group of portable 60-bit hash longs. */
  def hllRegisters(hash: Column): Column =
    GraftBridge.column(HllRegisterAggregate(GraftBridge.expression(hash))
      .toAggregateExpression())
}
