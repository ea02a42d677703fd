package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k sketch as a Catalyst `TypedImperativeAggregate`: keeps
  * the k largest `(value, id)` pairs (value desc, id asc tiebreak) in a
  * fixed-size buffer. Deterministic and mergeable — partial aggregation
  * runs map-side, the shuffle carries at most k pairs per group, and the
  * result is independent of partitioning (so the DuckDB oracle applies).
  *
  * This is the `TypedImperativeAggregate` extension point from SURVEY.md
  * §2.2 ("custom aggregates" — mutable-buffer sketches like HLL/quantile);
  * top-k is chosen because its output is exactly checkable.
  */
case class TopKAggregate(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(valueExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))))
  override def prettyName: String = "topk_sketch"

  /** Analysis-time validation (same trade as quantile_sketch —
    * ExpectsInputTypes is private[sql]): value must be DOUBLE, id
    * BIGINT (anything else CCEs in update), and k >= 1 (k <= 0 made
    * the buffer call List.last on Nil). */
  override def checkInputDataTypes(): TypeCheckResult =
    if (valueExpr.dataType != DoubleType || idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk: value must be DOUBLE and id BIGINT, got " +
          s"(${valueExpr.dataType.simpleString}, " +
          s"${idExpr.dataType.simpleString}) — cast the inputs")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk: k must be >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      buf.add(v.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    b.entries.foreach { case (v, id) => a.add(v, id) }
    a
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (v, id) =>
      InternalRow(v, id)
    }.toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    val es = buf.entries
    out.writeInt(es.size)
    es.foreach { case (v, id) => out.writeDouble(v); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    (0 until n).foreach(_ => buf.add(in.readDouble(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))
}

/** Mutable top-k buffer ordered by (value desc, id asc). Small k: a
  * sorted list with linear insertion is fine (k entries max). The
  * worst retained entry is CACHED in two primitive fields so the hot
  * path (buffer full, row below threshold — almost every row of an
  * O(n²) pair scan once warm) rejects with two compares and zero
  * allocation. */
final class TopKBuffer(val k: Int) {
  require(k >= 1, s"TopKBuffer: k must be >= 1, got $k")
  private var items: List[(Double, Long)] = Nil
  private var count = 0
  private var worstV = Double.NaN // defined only when count == k
  private var worstId = 0L

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  def add(v: Double, id: Long): Unit = {
    if (count == k && !(v > worstV || (v == worstV && id < worstId))) return
    val e = (v, id)
    val (before, after) = items.span(better(_, e))
    items = (before ::: (e :: after)).take(k)
    count = math.min(count + 1, k)
    if (count == k) {
      val last = items.last
      worstV = last._1
      worstId = last._2
    }
  }

  def entries: List[(Double, Long)] = items
  def sorted: List[(Double, Long)] = items
}

object TopKFunctions {
  /** Top-k (value, id) pairs per group as a sketch column. */
  def topK(value: Column, id: Column, k: Int): Column =
    GraftBridge.column(TopKAggregate(
      GraftBridge.expression(value), GraftBridge.expression(id), k)
      .toAggregateExpression())
}
