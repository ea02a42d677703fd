package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable stream-stream operators built from watermarked primitives —
  * the enrichment patterns the reference leaves entirely to user code
  * (its processor sees one record at a time; any cross-stream join is
  * the user's problem — `/root/reference/README.md:246-293`), packaged
  * here as one-call library surface.
  */
object StreamOps {

  /** Streaming AS-OF enrichment: for every left row, the single most
    * recent right row with the same key and `rightTs <= leftTs`,
    * within `lookback` — the q26/q123 as-of contract on unbounded
    * streams.
    *
    * Semantics and their costs, stated plainly:
    *  - a LOOKBACK BOUND is not optional: state for the right stream
    *    can only be evicted once the watermark passes
    *    `rightTs + lookback`, so an unbounded as-of would hold
    *    unbounded state (Flink's interval join carries the same
    *    contract). Choose the smallest lookback the domain allows.
    *  - built as a watermarked leftOuter time-interval join (state
    *    evicts by watermark) + a windowed `max_by((ts, tiebreak))`
    *    pick per left row, so multiple candidates collapse to the
    *    LATEST (ties broken by the tiebreak column, matching the
    *    batch oracle's ORDER BY ts DESC, id DESC LIMIT 1).
    *  - output is APPEND-mode: a left row emits once the watermark
    *    passes its pick window (plus the join's eviction delay) —
    *    correct and complete, not speculative.
    *  - left rows with NO candidate emit with a null right side
    *    (leftOuter), exactly like the batch as-of.
    *
    * Both inputs MUST already carry `withWatermark` on their ts
    * columns. Column names must be disjoint across the two sides
    * (rename before calling). WARNING (spec-pinned trap): do not
    * filter either stream on a sentinel/key predicate between
    * `withWatermark` and this join — Catalyst pushes such predicates
    * below the watermark node and the filtered rows stop advancing
    * the watermark.
    *
    * @param left       watermarked left stream (the rows to enrich)
    * @param right      watermarked right stream (the lookup timeline)
    * @param keyEq      join key equality, e.g. col("l_user") === col("r_user")
    * @param leftTs     left event-time column (watermarked)
    * @param rightTs    right event-time column (watermarked)
    * @param lookback   SQL interval string, e.g. "60 days"
    * @param leftCols   left columns to group the pick by — must
    *                   uniquely identify a left row (include its id)
    * @param pick       right columns to carry; the FIRST is also the
    *                   tie-break for equal `rightTs`
    * @param pickWindow tumbling-window width for the append-mode pick
    *                   (any value ≤ the left stream's natural spacing
    *                   works; it only gates emission granularity)
    */
  def asOfEnrich(
      left: DataFrame,
      right: DataFrame,
      keyEq: Column,
      leftTs: Column,
      rightTs: Column,
      lookback: String,
      leftCols: Seq[Column],
      pick: Seq[Column],
      pickWindow: String = "1 minute"): DataFrame = {
    require(pick.nonEmpty, "pick must name at least one right column")
    val joined = left.join(right,
      keyEq &&
        rightTs <= leftTs &&
        rightTs >= leftTs - expr(s"INTERVAL $lookback"),
      "leftOuter")
    val ord = struct(rightTs +: pick: _*)
    val aggs = pick.zipWithIndex.map { case (c, i) =>
      // max_by on (rightTs, pick...) — null-field structs sort below
      // real candidates, so unmatched rows yield nulls
      max_by(c, ord).as(s"_p$i")
    }
    val grouped = joined
      .groupBy(window(leftTs, pickWindow) +: leftCols: _*)
      .agg(aggs.head, aggs.tail: _*)
    grouped.select(
      leftCols.map(c => grouped(c.toString)) ++
        pick.zipWithIndex.map { case (c, i) =>
          col(s"_p$i").as(c.toString)
        }: _*)
  }
}
