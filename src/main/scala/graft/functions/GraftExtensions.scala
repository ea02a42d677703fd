package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql("... double_dot_product
  * (a, b) ...")` works cluster-wide via
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  * [[GraftFunctions.register]] does the same for an existing session
  * (local/test convenience).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.doubleDotProductDescriptor)
  }
}

object GraftFunctions {
  private[functions] val doubleDotProductDescriptor = (
    FunctionIdentifier("double_dot_product"),
    new ExpressionInfo(classOf[DoubleDotProduct].getName,
      "double_dot_product"),
    (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
      DoubleDotProduct(exprs(0), exprs(1)))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val (_, info, builder) = doubleDotProductDescriptor
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "double_dot_product", builder, "built-in")
  }
}
