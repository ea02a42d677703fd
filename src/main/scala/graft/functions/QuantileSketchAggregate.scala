package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable quantile sketch as a Catalyst `TypedImperativeAggregate`
  * (SURVEY.md §2.2 "custom aggregates"; the quantile-sketch slot from
  * NOTES.md round-3 candidates).
  *
  * Design: a KMV/bottom-k DISTINCT-value sample — keep the `k` entries
  * with the smallest `(hash, value)` over all distinct input values,
  * where the hash is supplied as an expression (the portable 60-bit md5
  * prefix, same idiom as q51/d05). Quantiles are then interpolated over
  * the sorted sample values (type-7, as q50).
  *
  * Why bottom-k-by-hash instead of t-digest/GK: the sample is a pure
  * FUNCTION OF THE VALUE SET — independent of row order, partitioning,
  * and merge tree — so the sketch is deterministic at any parallelism
  * and exactly reproducible by the DuckDB oracle (a t-digest's centroids
  * depend on merge order and would only ever get a rows-only check).
  * Accuracy: standard bottom-k sampling gives rank error O(1/sqrt(k))
  * on the distinct-value distribution.
  *
  * Scale: the buffer is O(k); partial aggregation runs map-side and the
  * shuffle carries at most k (hash, value) pairs per group.
  */
case class QuantileSketchAggregate(
    hashExpr: Expression,
    valueExpr: Expression,
    k: Int,
    ps: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketchBuffer] {

  override def children: Seq[Expression] = Seq(hashExpr, valueExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "quantile_sketch"

  /** Analysis-time validation (ExpectsInputTypes is private[sql] in
    * Spark 4, so the declaration is manual — same trade as the other
    * graft expressions): hash/value must be BIGINT (anything else used
    * to CCE deep inside update()), k >= 1 (k <= 0 made the buffer call
    * TreeSet.last on an empty set), at least one percentile, every
    * percentile in [0, 1] (outside used to index out of bounds in
    * eval). */
  override def checkInputDataTypes(): TypeCheckResult = {
    if (hashExpr.dataType != LongType || valueExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"quantile_sketch: hash and value must be BIGINT, got " +
          s"(${hashExpr.dataType.simpleString}, " +
          s"${valueExpr.dataType.simpleString}) — cast the inputs")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(
        s"quantile_sketch: sample size k must be >= 1, got $k")
    else if (ps.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        "quantile_sketch: at least one percentile is required")
    else if (ps.exists(p => p.isNaN || p < 0.0 || p > 1.0))
      TypeCheckResult.TypeCheckFailure(
        s"quantile_sketch: percentiles must be in [0, 1], got " +
          ps.mkString("(", ", ", ")"))
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): QuantileSketchBuffer =
    new QuantileSketchBuffer(k)

  override def update(buf: QuantileSketchBuffer, input: InternalRow)
      : QuantileSketchBuffer = {
    val h = hashExpr.eval(input)
    val v = valueExpr.eval(input)
    if (h != null && v != null)
      buf.add(h.asInstanceOf[Long], v.asInstanceOf[Long])
    buf
  }

  override def merge(a: QuantileSketchBuffer, b: QuantileSketchBuffer)
      : QuantileSketchBuffer = {
    b.entries.foreach { case (h, v) => a.add(h, v) }
    a
  }

  /** Type-7 interpolation over the ASCENDING sample values, expression
    * order pinned to match the oracle SQL bit-for-bit:
    * r = p*(n-1); est = v[floor(r)] + (r - floor(r)) * (v[ceil(r)] - v[floor(r)]). */
  override def eval(buf: QuantileSketchBuffer): Any = {
    val vs = buf.entries.map(_._2).toArray.sorted
    val out: Array[Any] =
      if (vs.isEmpty) ps.map(_ => 0.0).toArray[Any]
      else ps.map(QuantileSketchAggregate.interpolate(vs, _)).toArray[Any]
    new GenericArrayData(out)
  }

  override def serialize(buf: QuantileSketchBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    val es = buf.entries.toSeq // entries is an Iterator: materialize before size
    out.writeInt(es.size)
    es.foreach { case (h, v) => out.writeLong(h); out.writeLong(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): QuantileSketchBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new QuantileSketchBuffer(in.readInt())
    val n = in.readInt()
    (0 until n).foreach(_ => buf.add(in.readLong(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hashExpr = newChildren(0), valueExpr = newChildren(1))
}

object QuantileSketchAggregate {
  /** Type-7 interpolation over ASCENDING sample values — the single
    * source of the estimate algebra (expression order pinned to the
    * oracle SQL), shared by the batch aggregate's eval and the
    * streaming fold (StreamingOps.quantileFold). */
  def interpolate(vs: Array[Long], p: Double): Double = {
    val r = p * (vs.length - 1)
    val lo = math.floor(r).toInt
    val hi = math.ceil(r).toInt
    vs(lo) + (r - math.floor(r)) * (vs(hi) - vs(lo)).toDouble
  }
}

/** Bottom-k set of (hash, value) pairs, distinct, ordered ascending.
  * TreeSet gives O(log k) insert with cheap max eviction; the current
  * maximum is CACHED in two fields so the hot path (buffer full, row
  * above the threshold — almost every row once warm) rejects with two
  * primitive compares and zero allocation instead of a tuple alloc +
  * O(log k) `set.last` per row. */
final class QuantileSketchBuffer(val k: Int) {
  require(k >= 1, s"QuantileSketchBuffer: k must be >= 1, got $k")
  private val set = scala.collection.mutable.TreeSet.empty[(Long, Long)]
  private var maxH = Long.MaxValue
  private var maxV = Long.MaxValue

  private def refreshMax(): Unit =
    if (set.size == k) { val m = set.last; maxH = m._1; maxV = m._2 }

  def add(h: Long, v: Long): Unit = {
    if (set.size < k) {
      if (set.add((h, v))) refreshMax()
    } else if (h < maxH || (h == maxH && v < maxV)) {
      if (set.add((h, v))) { set.remove(set.last); refreshMax() }
    }
  }

  def entries: Iterator[(Long, Long)] = set.iterator
}

object QuantileSketchFunctions {
  /** Quantile estimates (one per p in `ps`) from a bottom-k distinct
    * sample of `value`, sampled by `hash` (use the portable 60-bit md5
    * prefix for oracle parity). */
  def quantileSketch(hash: Column, value: Column, k: Int,
      ps: Seq[Double]): Column =
    GraftBridge.column(QuantileSketchAggregate(
      GraftBridge.expression(hash), GraftBridge.expression(value), k, ps)
      .toAggregateExpression())
}
