package graft

import java.nio.charset.StandardCharsets.UTF_8
import graft.sinks.InMemoryAsyncClient
import graft.sources.{InMemoryShardService, RawShardRecord, ShardServiceRegistry}
import org.apache.spark.sql.functions._

/** The reference-shaped entry points: named-config source/sink facade and
  * the typed `Dataset[ConsumerEvent]` view (reference
  * main/stream/Kinesis.scala:47-151; typed API SURVEY.md §1.3).
  */
class FacadeSpec extends SparkSpec {

  test("Kinesis.source resolves named config and streams the envelope; " +
      "typed view exposes payloadAsString") {
    import spark.implicits._
    val svc = new InMemoryShardService("facade", Seq("shard-0"))
    (1 to 30).foreach(n => svc.append("shard-0",
      RawShardRecord.single(s"pk$n", BigInt(n), n.toLong,
        s"payload-$n".getBytes(UTF_8))))
    val svcId = ShardServiceRegistry.register(svc)
    val options = Map(
      "consumer.default.stream-name" -> "facade",
      "consumer.default.max-records" -> "7",
      "consumer.my-consumer.service.id" -> svcId,
      "consumer.my-consumer.application-name" -> "app")
    val tmp = java.nio.file.Files.createTempDirectory("graft-facade").toString

    val env = Kinesis.source(spark, options, "my-consumer")
    val typed = Kinesis.typed(env)
      .map(e => (e.seqNo.toLong, e.payloadAsString(), e.shardId))
    val q = typed.toDF("seq", "payload", "shard")
      .writeStream.format("memory").queryName("facade_out")
      .option("checkpointLocation", s"$tmp/chk").start()
    try q.processAllAvailable() finally q.stop()

    val rows = spark.table("facade_out")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(rows.length == 30)
    assert(rows.head == (1L, "payload-1", "shard-0"))
    assert(rows.last == (30L, "payload-30", "shard-0"))
  }

  test("Kinesis.sink writes a stream through the named producer config") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val key = "facade-sink"
    InMemoryAsyncClient.reset(key)
    val tmp = java.nio.file.Files.createTempDirectory("graft-facade").toString
    val input = MemoryStream[Int](spark)
    input.addData(1 to 25: _*)
    val df = input.toDS().toDF("n")
      .select(col("n").cast("string").as("partitionKey"),
        encode(col("n").cast("string"), "UTF-8").as("data"))
    val options = Map(
      "producer.default.stream-name" -> "out",
      "producer.my-producer.max-outstanding-requests" -> "4")
    val q = Kinesis.sink(df, options, "my-producer",
        InMemoryAsyncClient.Factory(key))
      .option("checkpointLocation", s"$tmp/chk").start()
    try q.processAllAvailable() finally q.stop()
    assert(InMemoryAsyncClient.sent(key).map(_.payload).toSet ==
      (1 to 25).map(_.toString).toSet)
  }

  test("boundedMapAsync (S7 mapAsync analogue): a type-changing async " +
      "transform keeps (shardId, seqNo) commit identity, emits in input " +
      "order, and never exceeds the concurrency bound") {
    import spark.implicits._
    import FacadeSpec._
    inFlight.set(0); highWater.set(0)
    val events = (1 to 60).map(n => ("shard-0", n.toLong, s"payload-$n"))
    val ds = events.toDF("shardId", "seq", "payload")
      .as[(String, Long, String)].repartition(1)
    val out = Kinesis.boundedMapAsync(ds, parallelism = 4) {
      case (sh, seq, p) =>
        scala.concurrent.Future {
          val cur = inFlight.incrementAndGet()
          highWater.accumulateAndGet(cur, math.max)
          Thread.sleep((seq % 3) + 1) // completion order != input order
          inFlight.decrementAndGet()
          (sh, seq, p.length) // type-changing: payload -> derived value
        }(asyncEc)
    }
    val rows = out.collect().toSeq
    assert(rows == events.map { case (sh, seq, p) => (sh, seq, p.length) },
      "output must preserve input order and (shardId, seqNo) identity")
    val hw = highWater.get()
    assert(hw <= 4, s"in-flight futures $hw exceeded parallelism 4")
    assert(hw >= 2, s"expected real concurrency under the bound; got $hw")
  }

  test("38-digit sequence numbers flow through source, checkpoint and " +
      "typed view intact (aggregated-record ordering hazard class)") {
    import spark.implicits._
    val big = BigInt("9999999999999999999999999999999999990")
    val svc = new InMemoryShardService("bigseq", Seq("shard-0"))
    (0 until 5).foreach(i => svc.append("shard-0",
      RawShardRecord.single("pk", big + i, i.toLong,
        s"v$i".getBytes(UTF_8))))
    val svcId = ShardServiceRegistry.register(svc)
    val tmp = java.nio.file.Files.createTempDirectory("graft-facade").toString
    def run(): Unit = {
      val q = spark.readStream.format("graft-kinesis")
        .option("service.id", svcId).load()
        .selectExpr("CAST(seqNo AS STRING) AS seq", "CAST(data AS STRING) AS p")
        .writeStream.format("parquet").option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/chk").start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    // restart after appending one more — resume must parse the 38-digit
    // offset back from the WAL correctly
    svc.append("shard-0", RawShardRecord.single("pk", big + 5, 5L,
      "v5".getBytes(UTF_8)))
    run()
    val seqs = spark.read.parquet(s"$tmp/out").select("seq")
      .as[String].collect().map(BigInt(_)).sorted.toSeq
    assert(seqs == (0 to 5).map(i => big + i).toSeq)
  }
}

object FacadeSpec {
  // static (not closure-captured) so executor threads in local mode share
  // them — the in-flight gauge backing the concurrency-bound assertion
  val inFlight = new java.util.concurrent.atomic.AtomicInteger()
  val highWater = new java.util.concurrent.atomic.AtomicInteger()
  lazy val asyncEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(16))
}
