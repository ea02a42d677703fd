package graft

import graft.config.ProducerConf
import graft.sinks.{GraftKinesisSink, GraftSinkWriter, ShardServiceAsyncClient}
import graft.sources.{InMemoryShardService, ShardServiceRegistry}
import org.apache.spark.sql.functions._

/** Full produced == consumed round trip through the stream abstraction:
  * sink (partition-key routing + KPL-style aggregation) -> shard store ->
  * graft-kinesis source (deaggregation) — the Spark twin of the
  * reference's sink integration spec
  * (it/stream/KinesisSinkGraphStageIntegrationSpec.scala:23-44).
  */
class RoundTripSpec extends SparkSpec {

  private def produceAndConsume(aggMax: Int, n: Int) = {
    import spark.implicits._
    val svc = new InMemoryShardService("rt", (0 until 4).map(i => s"shard-$i"))
    val svcId = ShardServiceRegistry.register(svc)

    val df = (1 to n).map(i => (s"key-${i % 13}", s"$i"))
      .toDF("partitionKey", "payload")
      .select(col("partitionKey"), encode(col("payload"), "UTF-8").as("data"))
    GraftKinesisSink.writeBatch(df,
      ShardServiceAsyncClient.Factory(svcId, aggMax),
      ProducerConf("rt", maxOutstandingRequests = 16))

    val tmp = java.nio.file.Files.createTempDirectory("graft-rt").toString
    val q = spark.readStream.format("graft-kinesis")
      .option("service.id", svcId).load()
      .selectExpr("shardId", "partitionKey", "seqNo", "subSeqNo",
        "CAST(data AS STRING) AS payload")
      .writeStream.format("memory").queryName(s"rt_$aggMax")
      .option("checkpointLocation", s"$tmp/chk").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(s"rt_$aggMax")
  }

  test("round trip without aggregation: produced == consumed") {
    val out = produceAndConsume(aggMax = 1, n = 500)
    val payloads = out.select("payload").collect().map(_.getString(0))
    assert(payloads.length == 500)
    assert(payloads.map(_.toInt).toSet == (1 to 500).toSet)
  }

  test("idempotent producer option: re-sending the same batch (task " +
      "retry) is dropped at the transport; without it, duplicates") {
    import spark.implicits._
    def runTwice(conf: ProducerConf): Long = {
      val svc = new InMemoryShardService("idem",
        (0 until 2).map(i => s"shard-$i"))
      val svcId = ShardServiceRegistry.register(svc)
      val df = (1 to 100).map(i => (s"key-${i % 7}", s"$i", s"id-$i"))
        .toDF("partitionKey", "payload", "record_id")
        .select(col("partitionKey"),
          encode(col("payload"), "UTF-8").as("data"), col("record_id"))
      // the same rows flow twice — the shape of a Spark task retry
      GraftKinesisSink.writeBatch(df.coalesce(1),
        ShardServiceAsyncClient.Factory(svcId, 10), conf)
      GraftKinesisSink.writeBatch(df.coalesce(1),
        ShardServiceAsyncClient.Factory(svcId, 10), conf)
      spark.read.format("graft-kinesis").option("service.id", svcId)
        .load().count()
    }
    val base = ProducerConf("idem", maxOutstandingRequests = 16)
    assert(runTwice(base) == 200, "at-least-once default: duplicates kept")
    assert(runTwice(base.copy(idempotencyColumn = Some("record_id"))) == 100,
      "idempotent option must drop the re-sent batch")
  }

  test("round trip WITH producer aggregation: sub-records deaggregate, " +
      "nothing lost, partition keys stay shard-sticky") {
    val out = produceAndConsume(aggMax = 25, n = 500)
    val rows = out.collect()
    assert(rows.length == 500)
    assert(rows.map(_.getString(4).toInt).toSet == (1 to 500).toSet)
    // aggregation actually happened: sub-sequence numbers beyond 0 exist
    assert(rows.map(r => r.getLong(3)).max > 0,
      "expected aggregated sub-records")
    // partition-key routing: each key maps to exactly one shard (S12)
    val keyShards = rows.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getString(0)).toSet).toMap
    assert(keyShards.values.forall(_.size == 1),
      s"keys must be shard-sticky: $keyShards")
  }

  test("aggregation-max-size bounds each aggregated wire record's bytes " +
      "(KPL AggregationMaxSize, reference.conf:77-91); nothing lost") {
    import spark.implicits._
    val svc = new InMemoryShardService("rt-size", Seq("shard-0"))
    val svcId = ShardServiceRegistry.register(svc)
    // one key -> one shard; 1-byte key + 30-byte payload = 31 B/record;
    // size bound 100 B admits exactly 3 sub-records per wire record
    val df = (1 to 60).map(i => ("k", f"p$i%028d"))
      .toDF("partitionKey", "payload")
      .select(col("partitionKey"), encode(col("payload"), "UTF-8").as("data"))
    GraftKinesisSink.writeBatch(df.coalesce(1),
      ShardServiceAsyncClient.Factory(svcId,
        aggregationMaxCount = 1000, aggregationMaxSize = 100),
      ProducerConf("rt-size", maxOutstandingRequests = 16))
    val out = spark.read.format("graft-kinesis").option("service.id", svcId)
      .load().selectExpr("seqNo", "subSeqNo", "CAST(data AS STRING) AS p")
      .collect()
    assert(out.length == 60)
    assert(out.map(_.getString(2)).toSet ==
      (1 to 60).map(i => f"p$i%028d").toSet)
    // every wire record carries exactly 3 sub-records (31*3=93 <= 100,
    // a 4th would overflow to 124)
    val perWire = out.groupBy(_.getDecimal(0)).view.mapValues(_.length)
    assert(perWire.values.forall(_ == 3),
      s"wire-record sizes: ${perWire.values.toSeq.sorted}")
  }
}
