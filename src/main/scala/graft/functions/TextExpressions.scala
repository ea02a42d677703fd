package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the character-trigram hot path (t05).
  *
  * `transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))`
  * allocates one 3-char UTF8String per trigram — tens of millions of
  * short-lived objects per partition on a corpus scan, and the downstream
  * hash aggregate keys on variable-length strings. This expression packs
  * each trigram's three CODE POINTS into one long (21 bits each — all of
  * Unicode fits, so packing is injective) in a single pass: the aggregate
  * then runs on fixed-width longs and only the final top-k rows are
  * decoded back to strings.
  *
  * Ordering: UTF-8 binary order equals code-point order, so sorting by
  * the packed long is EXACTLY sorting by the trigram string — top-k
  * tie-breaks survive the encoding unchanged (oracle parity).
  */
case class PackedTrigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "packed_trigrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"packed_trigrams: expected STRING, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    PackedTrigrams.pack(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PackedTrigrams.pack($c);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

object PackedTrigrams {
  /** One pass over the code points; code-point indexing matches Spark's
    * `substring`/`length` semantics (not UTF-16 units), so
    * unpack(pack(s)(i)) == substring(s, i+1, 3) for every i. */
  def pack(s: UTF8String): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length - 2
    if (n <= 0) new GenericArrayData(Array.emptyLongArray)
    else {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        out(i) = (cps(i).toLong << 42) |
          (cps(i + 1).toLong << 21) | cps(i + 2).toLong
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Inverse of one packed trigram — used only on final top-k rows. */
  def unpack(l: Long): String =
    new String(Array(((l >> 42) & 0x1FFFFF).toInt,
      ((l >> 21) & 0x1FFFFF).toInt, (l & 0x1FFFFF).toInt), 0, 3)
}

object TextFunctions {
  /** Codegen'd packed character trigrams of a string column. */
  def packedTrigrams(c: Column): Column =
    GraftBridge.column(PackedTrigrams(GraftBridge.expression(c)))
}
