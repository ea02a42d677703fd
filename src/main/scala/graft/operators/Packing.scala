package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-phase distributed prefix sum — the 100 TB running-sum shape
  * shared by t07 sequence packing and m08 media shard packing. A naive
  * `Window.partitionBy(stream)` funnels each whole stream through ONE
  * task; instead rows are statically range-partitioned into blocks of
  * `blkSize` doc_ids (deterministic, no sampling, monotone in the
  * prefix order): phase 1 computes the running sum inside each
  * (stream, block) bounded window — thousands of bounded groups, no
  * task ever holds more than one block of one stream; phase 2
  * aggregates one total per (stream, block) with map-side partial
  * aggregation, computes cross-block cumulative offsets with a window
  * over that tiny per-block table (rows = corpus/blkSize, not the
  * corpus), and broadcast-joins the offsets back. `blkSize` trades
  * window-group memory against offset-table size; at 100 TB raise it
  * so the offset table stays broadcastable.
  */
object Packing {

  /** Adds `cum` = running sum of `weightCol` over rows ordered by
    * `doc_id` within each `partCol` stream. `frame` must carry
    * `doc_id`, `partCol`, and `weightCol`; it is materialized once
    * (strategy selectable via [[Materialize]]) so BOTH phases read the
    * same narrow frame instead of re-running its upstream twice.
    */
  def twoPhasePrefixSum(frame: DataFrame, partCol: String,
      weightCol: String, blkSize: Long = 4096L,
      materialize: Materialize = Materialize.LocalCheckpoint): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base =
      materialize(frame.withColumn("blk", expr(s"doc_id div $blkSize")))
    // phase 1: bounded local prefix sums, one group per (part, blk)
    val wLocal = Window.partitionBy(col(partCol), col("blk"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base
      .withColumn("local_cum", sum(col(weightCol)).over(wLocal))
    // phase 2: per-block totals -> cumulative offsets of earlier blocks
    val wOff = Window.partitionBy(col(partCol)).orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col(partCol), col("blk"))
      .agg(sum(col(weightCol)).as("blk_total"))
      .withColumn("offset",
        coalesce(sum(col("blk_total")).over(wOff), lit(0L)))
      .select(col(partCol), col("blk"), col("offset"))
    local.join(broadcast(offsets), Seq(partCol, "blk"))
      .withColumn("cum", col("local_cum") + col("offset"))
      .drop("local_cum", "blk", "offset")
  }
}
