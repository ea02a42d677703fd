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

object VectorFunctions {
  /** Codegen'd dot product over two array<double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(DoubleDotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
