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
}
