package graft

import java.nio.charset.StandardCharsets.UTF_8
import graft.config.{ConsumerConf, ProducerConf}
import graft.sinks.{GraftSinkWriter, InMemoryAsyncClient}
import graft.sources.{InMemoryShardService, RawShardRecord, ShardServiceRegistry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end wiring demo of the reference-parity streaming path:
  * graft-kinesis DSv2 source (sharded, checkpointed, deaggregating) →
  * payload decode → graft sink (bounded in-flight, flush-on-commit).
  * Prints one summary line; exits nonzero on any loss/duplication.
  *
  * Run: sbt "runMain graft.StreamingDemo"
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-streaming-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nShards = 4
    val perShard = 2500
    val svc = new InMemoryShardService("demo",
      (0 until nShards).map(i => s"shard-$i"))
    for (s <- 0 until nShards; n <- 1 to perShard)
      svc.append(s"shard-$s",
        RawShardRecord.single(s"pk-$s", BigInt(n), 1700000000000000L + n,
          s"${s * perShard + n}".getBytes(UTF_8)))
    val svcId = ShardServiceRegistry.register(svc)

    val sinkKey = "demo-sink"
    InMemoryAsyncClient.reset(sinkKey)
    val tmp = java.nio.file.Files.createTempDirectory("graft-demo").toString

    val q = spark.readStream.format("graft-kinesis")
      .option("service.id", svcId)
      .option("max-records-per-shard", "1000")
      .load()
      .select(col("partitionKey"), col("data"))
      .writeStream
      .foreach(new GraftSinkWriter(
        InMemoryAsyncClient.Factory(sinkKey, latencyMillis = 0),
        ProducerConf("demo-out", maxOutstandingRequests = 100)))
      .option("checkpointLocation", s"$tmp/chk")
      .start()
    q.processAllAvailable()
    q.stop()

    val sent = InMemoryAsyncClient.sent(sinkKey)
    val payloads = sent.map(_.payload.toInt)
    val expected = nShards * perShard
    val ok = payloads.size == expected && payloads.toSet.size == expected
    println(s"""{"demo":"source->sink","records":${payloads.size},""" +
      s""""distinct":${payloads.toSet.size},"expected":$expected,"ok":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
