package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-Min sketch as a Catalyst `TypedImperativeAggregate` — the
  * sketch-aggregate family's fifth member beside graft_topk /
  * quantile_sketch / simhash_agg / hll_register_agg, covering the one
  * mergeable summary the family lacked: approximate FREQUENCY (HLL
  * answers "how many distinct", CMS answers "how often does THIS key
  * occur") with a point estimate that can only overcount, never
  * undercount.
  *
  * `cms_sketch_agg(h, depth, width)` folds the portable 60-bit hash
  * stream into a depth×width counter matrix, emitted row-major as
  * ARRAY<BIGINT>. The d row indices are independent bit-slices of the
  * one portable hash — row i probes bucket `(h >>> (i·log2 w)) & (w−1)`
  * — so both engines can rebuild the identical matrix from the identical
  * md5-prefix hash (the q114 register discipline); width must be a power
  * of two and depth·log2(width) ≤ 60 so every slice draws fresh hash
  * bits. The point estimate `min_i C[i][idx_i(k)]` stays OUTSIDE the
  * aggregate as a row-local projection over the emitted array (the q126
  * stance: the aggregate owns the deterministic mergeable state, the
  * caller owns the estimate algebra).
  *
  * Merge is element-wise ADD — the property that makes CMS the
  * streaming/distributed frequency summary: partial sketches from any
  * partitioning of history (map-side partials, daily batches, shards)
  * sum to the exact sketch of the union stream, bit-for-bit. State is
  * depth·width·8 bytes per group (2 KB at the 4×64 demo shape)
  * regardless of input size — the exchange carries one matrix per
  * group, never the keys.
  *
  * Reference delegates all sketching to user code behind its processor
  * seam (`/root/reference/README.md:246-293`).
  *
  * A negative input throws, as in the HLL register fold: the portable
  * hash family is non-negative 60-bit by construction, and a sign bit
  * would smear into every row slice.
  */
case class CmsSketchAggregate(
    hashExpr: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 8,
    s"cms_sketch_agg: depth must be in [1, 8], got $depth")
  require(width >= 2 && (width & (width - 1)) == 0,
    s"cms_sketch_agg: width must be a power of two, got $width")
  private val logW = java.lang.Integer.numberOfTrailingZeros(width)
  require(depth * logW <= 60,
    s"cms_sketch_agg: depth·log2(width) = ${depth * logW} exceeds the " +
      "60 portable hash bits — shrink depth or width")

  override def children: Seq[Expression] = Seq(hashExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (hashExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_sketch_agg: hash must be BIGINT, got " +
          s"${hashExpr.dataType.simpleString} — cast the input")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = hashExpr.eval(input)
    if (h != null)
      CmsSketchAggregate.observe(buf, h.asInstanceOf[Long], depth, logW)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): CmsSketchAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): CmsSketchAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketchAggregate =
    copy(hashExpr = newChildren(0))
}

object CmsSketchAggregate {
  /** Fold one hash into a row-major depth×2^logW counter matrix in
    * place — the single source of the row-slice algebra, shared by the
    * batch aggregate and the streaming fold (StreamingOps.cmsFold) so
    * the two surfaces cannot drift. */
  def observe(counters: Array[Long], hv: Long, depth: Int, logW: Int): Unit = {
    if (hv < 0L) throw new IllegalArgumentException(
      s"cms_sketch_agg: negative hash $hv — the row-slice algebra is " +
        "defined over the non-negative 60-bit portable hash family")
    val mask = (1L << logW) - 1L
    var i = 0
    while (i < depth) {
      counters((i << logW) + ((hv >>> (i * logW)) & mask).toInt) += 1L
      i += 1
    }
  }

  /** Point estimate for a key's hash: min over rows of the probed
    * counter — the CMS guarantee is estimate ≥ true count always. */
  def estimate(counters: Array[Long], hv: Long, depth: Int, logW: Int): Long = {
    val mask = (1L << logW) - 1L
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = counters((i << logW) + ((hv >>> (i * logW)) & mask).toInt)
      if (c < best) best = c
      i += 1
    }
    best
  }
}

object CmsFunctions {
  /** Row-major depth×width Count-Min counter matrix of a group of
    * portable 60-bit hash longs. */
  def cmsSketch(hash: Column, depth: Int, width: Int): Column =
    GraftBridge.column(
      CmsSketchAggregate(GraftBridge.expression(hash), depth, width)
        .toAggregateExpression())
}
