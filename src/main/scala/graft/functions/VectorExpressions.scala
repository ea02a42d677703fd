package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the vector-similarity hot path.
  *
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` evaluates per-element lambdas
  * interpreted (higher-order functions don't participate in whole-stage
  * codegen), which dominates brute-force O(n²·d) similarity scans. This
  * expression generates a tight primitive loop instead — same sequential
  * left-to-right accumulation, so results stay bit-identical to the
  * interpreted form (and to DuckDB's list_dot_product — oracle parity).
  */
case class DoubleDotProduct(left: Expression, right: Expression,
    zipWithSemantics: Boolean = false)
    extends BinaryExpression {

  // inputs are always array<double> at the call sites (cast upstream)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_dot_product"
  // zip_with mode returns null on length mismatch or any null element
  override def nullable: Boolean =
    zipWithSemantics || left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (zipWithSemantics && x.numElements() != y.numElements()) null
    else {
      val n = math.min(x.numElements(), y.numElements())
      var sum = 0.0
      var i = 0
      while (i < n) {
        if (zipWithSemantics && (x.isNullAt(i) || y.isNullAt(i)))
          return null
        sum += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      sum
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      if (!zipWithSemantics)
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $sum = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $sum += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $sum;
         """.stripMargin
      else
        s"""
           |if ($a.numElements() != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $n = $a.numElements();
           |  double $sum = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
           |      ${ev.isNull} = true; break;
           |    }
           |    $sum += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |  if (!${ev.isNull}) { ${ev.value} = $sum; }
           |}
         """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Map-only nearest-centroid ranking: the top-`k` centroids for one
  * vector against a (broadcast, 1-row) centroid array, without ever
  * materializing the |vectors| × |centroids| join the window-rank
  * formulation pays. At 100 TB the assignment stage is the hot loop of
  * every IVF index build — expanding it to rows (then exchanging and
  * sorting them for `row_number`) multiplies the corpus by the cell
  * count on the wire; this expression keeps the corpus at n rows and
  * does the argmin in a tight primitive loop per row.
  *
  * Inputs: `v` array<double>, `nrm` double (pass 0.0 for L2 mode),
  * `cents` array<struct<id long, vec array<double>, aux double>>
  * SORTED ASCENDING BY id (ties then resolve to the smallest id via
  * strict-inequality insertion — the same total order as
  * `row_number() OVER (ORDER BY score [DESC], id)`).
  *
  * Scoring matches the windowed form bit-for-bit (oracle parity):
  *  - cosine mode: `dot(v, cv) / (nrm * cn)`, ranked descending;
  *  - L2 mode:     `(dot(v,v) - 2.0*dot(v,cv)) + dot(cv,cv)`, ranked
  *    ascending — the identical parenthesization [[graft.operators]]
  *    uses everywhere (`l2sq`).
  *
  * Output: array<struct<cent_id long, score double>> of length
  * min(k, |cents|), best first (posexplode pos + 1 == the old `crk`).
  */
case class TopCentroids(v: Expression, nrm: Expression, cents: Expression,
    k: Int, byCosine: Boolean)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 1, "top_centroids: k must be >= 1")

  override def children: Seq[Expression] = Seq(v, nrm, cents)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "top_centroids"

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cent_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("score", DoubleType,
        nullable = false))), containsNull = false)

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val va = v.eval(input)
    val na = nrm.eval(input)
    val ca = cents.eval(input)
    if (va == null || na == null || ca == null) return null
    val x = va.asInstanceOf[ArrayData]
    val xn = na.asInstanceOf[Double]
    val cs = ca.asInstanceOf[ArrayData]
    val d = x.numElements()
    val nc = cs.numElements()
    // L2 mode: dot(v, v) computed once per input row
    var vv = 0.0
    if (!byCosine) {
      var i = 0
      while (i < d) { vv += x.getDouble(i) * x.getDouble(i); i += 1 }
    }
    val m = math.min(k, nc)
    val topId = new Array[Long](m)
    val topScore = new Array[Double](m)
    var filled = 0
    var c = 0
    while (c < nc) {
      val row = cs.getStruct(c, 3)
      val cv = row.getArray(1)
      val len = math.min(d, cv.numElements())
      var vc = 0.0
      var i = 0
      while (i < len) { vc += x.getDouble(i) * cv.getDouble(i); i += 1 }
      val score =
        if (byCosine) vc / (xn * row.getDouble(2))
        else {
          var cc = 0.0
          var j = 0
          val ncv = cv.numElements()
          while (j < ncv) { cc += cv.getDouble(j) * cv.getDouble(j); j += 1 }
          (vv - 2.0 * vc) + cc
        }
      // strict-inequality insertion over an id-ascending scan keeps the
      // earliest (smallest) cent_id on score ties — row_number's order
      var pos = math.min(filled, m)
      while (pos > 0 &&
          (if (byCosine) score > topScore(pos - 1)
           else score < topScore(pos - 1))) pos -= 1
      if (pos < m) {
        var s = math.min(filled, m - 1)
        while (s > pos) {
          topId(s) = topId(s - 1); topScore(s) = topScore(s - 1); s -= 1
        }
        topId(pos) = row.getLong(0)
        topScore(pos) = score
        if (filled < m) filled += 1
      }
      c += 1
    }
    val out = new Array[Any](filled)
    var r = 0
    while (r < filled) {
      out(r) = org.apache.spark.sql.catalyst.InternalRow(
        topId(r), topScore(r))
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(v = newChildren(0), nrm = newChildren(1), cents = newChildren(2))
}

object VectorFunctions {
  /** Codegen'd dot product over two array<double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(DoubleDotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Top-k nearest centroids (see [[TopCentroids]]). `cents` must be an
    * id-ascending array<struct<id, vec, aux>> column (1-row broadcast). */
  def topCentroids(v: Column, nrm: Column, cents: Column, k: Int,
      byCosine: Boolean): Column =
    GraftBridge.column(TopCentroids(GraftBridge.expression(v),
      GraftBridge.expression(nrm), GraftBridge.expression(cents),
      k, byCosine))
}
