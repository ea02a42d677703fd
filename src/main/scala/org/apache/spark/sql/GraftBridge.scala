package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge. Spark 4 made the conversion utilities
  * `private[sql]` (`classic.ExpressionUtils`); extension libraries place
  * this one-liner inside the package to build Columns from custom
  * Catalyst expressions (same approach as delta/frameless).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Free the block-manager storage behind a `localCheckpoint`ed Dataset.
    * `Dataset.unpersist()` only consults the CacheManager, which never
    * sees checkpoint RDDs — without this, every checkpointed retry round
    * of a long-running stream leaks executor storage until GC.
    */
  def unpersistCheckpoint(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.collect {
      case l: execution.LogicalRDD => l.rdd.unpersist(blocking = false)
    }
}
