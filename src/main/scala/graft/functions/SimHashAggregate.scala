package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** 60-bit SimHash fold as a Catalyst `TypedImperativeAggregate`: the
  * per-group state is the 60 signed bit counters, update adds ±1 per bit
  * of each incoming 60-bit word hash in one tight loop, merge is
  * element-wise addition, eval reassembles the sign bits into the
  * fingerprint long. Replaces the 60-column `sum(when(bit, 1, -1))`
  * formulation in the d05/d28 fingerprint frame — same math
  * bit-for-bit (so the DuckDB oracle is unchanged), but one aggregate
  * instead of 60 (smaller plan, one partial-agg buffer of 60 longs, a
  * 480-byte shuffle row per group instead of 60 separate columns).
  * Deterministic and mergeable: partial aggregation runs map-side and
  * the result is independent of partitioning, the same contract as
  * `graft_topk` / `quantile_sketch`.
  *
  * Counters are Long so a pathological single-document bit count can
  * never wrap (an Int would overflow past ~2.1e9 words per group).
  */
case class SimHashAggregate(
    hashExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val Bits = 60

  override def children: Seq[Expression] = Seq(hashExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (hashExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"simhash_agg: hash must be BIGINT, got " +
          s"${hashExpr.dataType.simpleString} — cast the input")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = hashExpr.eval(input)
    if (h != null) SimHashAggregate.observe(buf, h.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Bits) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = SimHashAggregate.fingerprint(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < Bits) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](Bits)
    var i = 0
    while (i < Bits) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): SimHashAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): SimHashAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAggregate =
    copy(hashExpr = newChildren(0))
}

object SimHashAggregate {
  /** Fold one word-hash into the 60 bit-counters in place — the single
    * source of the vote algebra, shared by the batch aggregate and the
    * streaming fold (StreamingOps.simhashFold) so the two surfaces
    * cannot drift. */
  def observe(buf: Array[Long], hv: Long): Unit = {
    var i = 0
    while (i < 60) {
      buf(i) += (((hv >>> i) & 1L) * 2L) - 1L
      i += 1
    }
  }

  /** Majority-vote fingerprint of a counter state. */
  def fingerprint(buf: Array[Long]): Long = {
    var fp = 0L
    var i = 0
    while (i < 60) {
      if (buf(i) > 0L) fp |= (1L << i)
      i += 1
    }
    fp
  }
}

object SimHashFunctions {
  /** 60-bit SimHash fingerprint of a group of word-hash longs. */
  def simhash(hash: Column): Column =
    GraftBridge.column(SimHashAggregate(GraftBridge.expression(hash))
      .toAggregateExpression())
}
