package graft.streaming

import graft.config.ConsumerConf
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import scala.util.control.NonFatal

/** The reference's batch state machine (ConsumerWorker, S3/S4/S8/S15 in
  * SURVEY.md §2.1) re-expressed for `foreachBatch`:
  *
  *  - every record is offered to the processor; per-record success is
  *    tracked (reference main/consumer/ConsumerWorker.scala:328-383)
  *  - failed records — and ONLY failed records — are retried, up to
  *    `failedMessageRetries` times (`:385-394`)
  *  - after retries, if failures <= floor(tolerance% x batchSize) the
  *    batch still succeeds: failed records are dead-lettered and the
  *    offset advances past them (`:396-407`; skip semantics `:368-374`,
  *    README.md:305-311)
  *  - above tolerance the batch throws — Structured Streaming fails the
  *    query without committing the offset range, the analogue of
  *    `ConsumerWorkerFailure` + KCL worker shutdown (`:408-414`,
  *    main/consumer/ConsumerProcessingManager.scala:113-121)
  *
  * The contiguous-ack watermark (ResponseCollector, `:259-276`) is
  * subsumed by Spark's atomic offset-range commit: a micro-batch commits
  * iff this harness returns, so the "all earlier records processed"
  * invariant holds by construction; the duplication window on crash is
  * one micro-batch (vs. up to `checkpointInterval` of acked work in the
  * reference — SURVEY.md §7.3.1).
  *
  * Everything here is distributed: per-record attempts run in
  * `mapPartitions` on executors, the retry loop on the driver only
  * orchestrates Dataset handles (no row ever reaches the driver).
  */
object CommitHarness {

  final case class BatchStats(
      batchSize: Long,
      succeeded: Long,
      deadLettered: Long,
      attempts: Int)

  /** Raised when failures exceed tolerance — fails the streaming query
    * (at-least-once: the offset range is not committed). */
  final class BatchFailedException(
      val failed: Long, val allowed: Long, val batchSize: Long)
    extends RuntimeException(
      s"batch failed: $failed failures > tolerance $allowed of $batchSize")

  /** Process one (micro-)batch with retry-only-unacked + tolerance
    * semantics. `attempt` returns true/throws-or-false per record.
    * Returns (deadLetters, stats); throws [[BatchFailedException]] above
    * tolerance.
    */
  def processBatch[T: Encoder](
      batch: Dataset[T],
      attempt: T => Boolean,
      conf: ConsumerConf): (Dataset[T], BatchStats) = {
    val safe = (t: T) =>
      try attempt(t)
      catch { case NonFatal(_) => false }

    implicit val tupleEnc: Encoder[(T, Boolean)] =
      Encoders.tuple(implicitly[Encoder[T]], Encoders.scalaBoolean)

    val total = batch.count()
    var pending = batch
    var toFree: List[Dataset[(T, Boolean)]] = Nil
    var pendingCount = total
    var attemptsMade = 0
    val maxAttempts = conf.failedMessageRetries + 1
    while (pendingCount > 0 && attemptsMade < maxAttempts) {
      // localCheckpoint severs lineage: the (side-effecting) processor is
      // invoked exactly once per record per round — a later action on the
      // dead-letter Dataset must not re-run user code (the reference's
      // ack bookkeeping is similarly write-once,
      // main/consumer/ConsumerWorker.scala:368-383)
      val results = pending.map(t => (t, safe(t))).localCheckpoint(true)
      val failed = results.filter(!_._2).map(_._1)
      pendingCount = failed.count()
      // previous round's checkpoint blocks are no longer referenced once
      // this round's failed-set is materialized — free them now; the last
      // round backs the returned dead-letter Dataset and is freed by
      // freeDeadLetters (runStream does this after the dead-letter write)
      toFree.foreach(org.apache.spark.sql.GraftBridge.unpersistCheckpoint)
      toFree = List(results)
      pending = failed
      attemptsMade += 1
    }
    val allowed = conf.allowedFailures(total)
    if (pendingCount > allowed)
      throw new BatchFailedException(pendingCount, allowed, total)
    (pending, BatchStats(total, total - pendingCount, pendingCount,
      attemptsMade))
  }

  /** Release the checkpoint storage behind the dead-letter Dataset
    * returned by [[processBatch]] (call after consuming it). */
  def freeDeadLetters(dead: Dataset[_]): Unit =
    org.apache.spark.sql.GraftBridge.unpersistCheckpoint(dead)

  /** Wire the harness into a streaming query: per-batch retry/tolerance
    * processing with dead letters appended to a parquet path (the
    * `successful=false` skip path — offsets advance past dead letters,
    * they never block the stream).
    */
  def runStream[T: Encoder](
      stream: Dataset[T],
      attempt: T => Boolean,
      conf: ConsumerConf,
      deadLetterPath: Option[String],
      checkpointLocation: String): DataStreamWriter[T] = {
    stream.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (ds: Dataset[T], batchId: Long) =>
        val (dead, stats) = processBatch(ds, attempt, conf)
        if (stats.deadLettered > 0) deadLetterPath.foreach { p =>
          dead.write.mode("append").parquet(p)
        }
        freeDeadLetters(dead)
        ()
      }
  }
}
