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

  test("two CONCURRENT queries on disjoint shard-filter pushdowns of one " +
      "stream: every record delivered exactly once across the pair, and " +
      "each query READS only its own shards (the reference's 2-worker " +
      "lease-rebalance guarantee, " +
      "it/stream/KinesisSourceGraphStageIntegrationSpec.scala:26-130)") {
    import graft.sources.{InMemoryShardService, RawShardRecord, ShardServiceRegistry}
    import org.apache.spark.sql.functions.col
    val shardIds = (0 until 4).map(i => s"shard-$i")
    val svc = new InMemoryShardService("handover", shardIds)
    def seed(from: Int, n: Int): Unit =
      for (i <- from until from + n; s <- shardIds)
        svc.append(s, RawShardRecord.single(s"k$i", BigInt(i + 1),
          1700000000000000L + i, s"$s:$i".getBytes("UTF-8")))
    seed(0, 25) // 25 records x 4 shards pre-seeded
    val svcId = ShardServiceRegistry.register(svc)

    def startHalf(name: String, shards: Seq[String]) = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-ho-$name")
        .toString
      spark.readStream.format("graft-kinesis")
        .option("service.id", svcId)
        .option("shard-filter", shards.mkString(",")) // static assignment
        .load()
        .selectExpr("shardId", "CAST(seqNo AS LONG) AS seq",
          "CAST(data AS STRING) AS payload")
        .writeStream.format("memory").queryName(s"ho_$name")
        .option("checkpointLocation", s"$tmp/chk").start()
    }
    val qa = startHalf("a", shardIds.take(2))
    val qb = startHalf("b", shardIds.drop(2))
    try {
      qa.processAllAvailable(); qb.processAllAvailable()
      seed(25, 25) // records arriving while BOTH queries are live
      qa.processAllAvailable(); qb.processAllAvailable()

      val a = spark.table("ho_a").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      val b = spark.table("ho_b").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      // disjoint coverage: each record in exactly one query's output
      assert(a.toSet.intersect(b.toSet).isEmpty)
      assert(a.size == 100 && b.size == 100, s"a=${a.size} b=${b.size}")
      assert((a ++ b).toSet ==
        (for (s <- shardIds; i <- 1 to 50) yield (s, i.toLong)).toSet)
      // pushdown proof: each query READ only its own shards' records —
      // the other half never entered its micro-batches (planning-time
      // shard pruning, not post-scan filtering)
      def rowsRead(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
        q.recentProgress.map(_.numInputRows).sum
      assert(rowsRead(qa) == 100,
        s"query A read ${rowsRead(qa)} rows; 100 live on its shards")
      assert(rowsRead(qb) == 100,
        s"query B read ${rowsRead(qb)} rows; 100 live on its shards")
    } finally { qa.stop(); qb.stop() }
  }

  test("KCL checkpoint import: a stream started from a converted " +
      "DynamoDB lease-table export consumes exactly the " +
      "post-checkpoint suffix; unleased shards follow initial-position") {
    import graft.sources.{InMemoryShardService, RawShardRecord,
      ShardServiceRegistry}
    val svc = new InMemoryShardService("mig", Seq("shard-a", "shard-b",
      "shard-new"))
    def put(shard: String, seq: Int): Unit = svc.append(shard,
      RawShardRecord.single(s"k$seq", BigInt(seq), seq.toLong,
        s"$shard-$seq".getBytes("UTF-8")))
    (1 to 10).foreach(put("shard-a", _))   // KCL checkpointed at 6
    (1 to 5).foreach(put("shard-b", _))    // lease TRIM_HORIZON (no ckpt)
    (1 to 4).foreach(put("shard-new", _))  // post-migration shard: no lease
    // the reference's <app>-<stream> lease table, exported as DynamoDB
    // JSON (one {"Item":...} per line; KinesisConsumer.scala:71-74)
    val export = Seq(
      """{"Item":{"leaseKey":{"S":"shard-a"},"checkpoint":{"S":"6"},""" +
        """"checkpointSubSequenceNumber":{"N":"0"},""" +
        """"leaseOwner":{"S":"worker-1"},"leaseCounter":{"N":"42"}}}""",
      """{"Item":{"leaseKey":{"S":"shard-b"},""" +
        """"checkpoint":{"S":"TRIM_HORIZON"},""" +
        """"leaseOwner":{"S":"worker-2"},"leaseCounter":{"N":"7"}}}""")
    val (positions, latestOnly, atTsOnly) =
      graft.ImportKclCheckpoints.convert(export.iterator)
    assert(latestOnly.isEmpty && atTsOnly.isEmpty)
    val imported = graft.sources.GraftShardOffsets(positions).json()
    // shard-a resumes after seq 6; shard-b from the very beginning
    assert(imported.contains(""""shard-a":"6:0""""))
    assert(positions("shard-b") === graft.sources.ShardPos.Beginning)
    assert(!positions.contains("shard-new"))
    val id = ShardServiceRegistry.register(svc)
    val tmp = java.nio.file.Files.createTempDirectory("graft-mig").toString
    val q = spark.readStream.format("graft-kinesis")
      .option("service.id", id)
      .option("initial-positions", imported)
      .option("initial-position", "TRIM_HORIZON") // the no-lease fallback
      .load()
      .selectExpr("shardId", "CAST(data AS STRING) AS v")
      .writeStream.format("memory").queryName("mig_out")
      .option("checkpointLocation", s"$tmp/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000L)
    val got = spark.table("mig_out").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val expected =
      (7 to 10).map(i => ("shard-a", s"shard-a-$i")).toSet ++ // suffix only
        (1 to 5).map(i => ("shard-b", s"shard-b-$i")).toSet ++ // full replay
        (1 to 4).map(i => ("shard-new", s"shard-new-$i")).toSet // fallback
    assert(got === expected,
      "imported checkpoints must yield exactly the post-checkpoint suffix")
    // a corrupt import fails the query loudly instead of reprocessing
    val bad = intercept[Exception] {
      spark.readStream.format("graft-kinesis")
        .option("service.id", id)
        .option("initial-positions", """{"shard-a":"oops"}""")
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", s"$tmp/chk2")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(60000L)
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(bad).exists(t => Option(t.getMessage)
      .exists(_.contains("unparseable shard-offset"))))
  }

  test("KCL AT_TIMESTAMP lease import: the sentinel translates to the " +
      "config-carried timestamp (initial-position AT_TIMESTAMP:<ms>, " +
      "as KCL reads it from worker config) and the shard consumes " +
      "exactly the at-or-after-timestamp suffix") {
    import graft.sources.{InMemoryShardService, RawShardRecord,
      ShardServiceRegistry}
    val svc = new InMemoryShardService("migts", Seq("shard-ckpt",
      "shard-ts"))
    // arrival timestamps at whole seconds: record i arrives at i s
    def put(shard: String, seq: Int): Unit = svc.append(shard,
      RawShardRecord.single(s"k$seq", BigInt(seq), seq * 1000000L,
        s"$shard-$seq".getBytes("UTF-8")))
    (1 to 10).foreach(put("shard-ckpt", _)) // numeric checkpoint at 6
    (1 to 10).foreach(put("shard-ts", _))   // AT_TIMESTAMP lease
    val export = Seq(
      """{"Item":{"leaseKey":{"S":"shard-ckpt"},"checkpoint":{"S":"6"},""" +
        """"checkpointSubSequenceNumber":{"N":"0"}}}""",
      """{"Item":{"leaseKey":{"S":"shard-ts"},""" +
        """"checkpoint":{"S":"AT_TIMESTAMP"}}}""")
    val (positions, latestOnly, atTsOnly) =
      graft.ImportKclCheckpoints.convert(export.iterator)
    assert(latestOnly.isEmpty)
    assert(atTsOnly === Seq("shard-ts"),
      "the AT_TIMESTAMP lease must be reported for the config fallback")
    assert(!positions.contains("shard-ts"))
    val imported = graft.sources.GraftShardOffsets(positions).json()
    val id = ShardServiceRegistry.register(svc)
    val tmp = java.nio.file.Files.createTempDirectory("graft-migts").toString
    val q = spark.readStream.format("graft-kinesis")
      .option("service.id", id)
      .option("initial-positions", imported)
      // the application's configured timestamp: 7 s — KCL's
      // initialPositionInStreamExtended, ms epoch in the engine grammar
      .option("initial-position", "AT_TIMESTAMP:7000")
      .load()
      .selectExpr("shardId", "CAST(data AS STRING) AS v")
      .writeStream.format("memory").queryName("migts_out")
      .option("checkpointLocation", s"$tmp/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000L)
    val got = spark.table("migts_out").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val expected =
      (7 to 10).map(i => ("shard-ckpt", s"shard-ckpt-$i")).toSet ++
        (7 to 10).map(i => ("shard-ts", s"shard-ts-$i")).toSet
    assert(got === expected,
      "AT_TIMESTAMP shard must yield exactly the at-or-after suffix " +
        "while checkpointed shards keep their post-checkpoint resume")
  }
}
