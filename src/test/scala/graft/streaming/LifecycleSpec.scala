package graft.streaming

import java.util.concurrent.{CountDownLatch, TimeUnit}
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Query lifecycle surface — the Spark analogue of the reference's
  * shutdown/failure notifications (S14/S15 in SURVEY.md §2.1:
  * `ConsumerShutdown(shardId)` to the processor on graceful stop,
  * reference main/consumer/ConsumerWorker.scala:450-499, and the
  * `start(): Future[Unit]` failure surface,
  * main/consumer/KinesisConsumer.scala:236-271):
  *
  *  - graceful stop → `onQueryTerminated` with no exception; the last
  *    committed batch persists (restart spec covers the data side)
  *  - a failing batch → `awaitTermination` throws AND the listener sees
  *    the exception — both notification paths the reference exposes
  */
class LifecycleSpec extends SparkSpec {

  private class Recorder extends StreamingQueryListener {
    val terminated = new CountDownLatch(1)
    @volatile var exception: Option[String] = None
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
      exception = e.exception
      terminated.countDown()
    }
  }

  test("graceful stop notifies the listener without an exception " +
      "(ConsumerShutdown analogue)") {
    import spark.implicits._
    val rec = new Recorder
    spark.streams.addListener(rec)
    try {
      val tmp = java.nio.file.Files.createTempDirectory("graft-lc").toString
      val input = MemoryStream[Long](spark)
      val q = input.toDS().writeStream.format("memory")
        .queryName("lc_graceful")
        .option("checkpointLocation", s"$tmp/chk").start()
      input.addData(1L, 2L, 3L)
      q.processAllAvailable()
      q.stop()
      assert(rec.terminated.await(30, TimeUnit.SECONDS))
      assert(rec.exception.isEmpty, s"graceful stop: ${rec.exception}")
      assert(spark.table("lc_graceful").count() == 3)
    } finally spark.streams.removeListener(rec)
  }

  test("batch failure surfaces through BOTH awaitTermination and the " +
      "listener (ConsumerWorkerFailure analogue)") {
    import spark.implicits._
    val rec = new Recorder
    spark.streams.addListener(rec)
    try {
      val tmp = java.nio.file.Files.createTempDirectory("graft-lc").toString
      val input = MemoryStream[Long](spark)
      val q = input.toDS()
        .map { v => if (v == 13L) throw new RuntimeException("poison"); v }
        .writeStream.format("memory").queryName("lc_fail")
        .option("checkpointLocation", s"$tmp/chk").start()
      input.addData(1L, 13L)
      val thrown = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(30000)
        ()
      }
      assert(thrown.getMessage.contains("poison") ||
        Option(thrown.getCause).exists(_.getMessage.contains("poison")))
      assert(rec.terminated.await(30, TimeUnit.SECONDS))
      assert(rec.exception.isDefined, "listener must see the failure")
    } finally spark.streams.removeListener(rec)
  }
}
