package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bounded snapshot (batch) reads of the stream — backfill/replay as a
  * table — with genuine column pruning at the scan (the V2 pushdown path
  * Spark applies to batch reads).
  */
class BatchReadSpec extends SparkSpec {

  private def mkService(): String = {
    val svc = new InMemoryShardService("batchread", Seq("shard-0", "shard-1"))
    for (s <- 0 until 2; n <- 1 to 50)
      svc.append(s"shard-$s", RawShardRecord.single(s"pk$n", BigInt(n),
        n.toLong, s"${s * 50 + n}".getBytes(UTF_8)))
    ShardServiceRegistry.register(svc)
  }

  test("spark.read over the stream returns the full snapshot") {
    val id = mkService()
    val df = spark.read.format("graft-kinesis").option("service.id", id).load()
    assert(df.count() == 100)
    val payloads = df.selectExpr("CAST(data AS STRING)")
      .collect().map(_.getString(0).toInt).toSet
    assert(payloads == (1 to 100).toSet)
  }

  test("shardId filter prunes whole shards at planning time (partition " +
      "pruning: a single-shard backfill reads one partition)") {
    val id = mkService()
    val df = spark.read.format("graft-kinesis").option("service.id", id)
      .load().where(col("shardId") === "shard-1")
      .select(col("shardId"), col("seqNo"))
    assert(df.rdd.getNumPartitions == 1,
      "only the matching shard may be planned")
    assert(df.count() == 50)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("shards=shard-1"),
      s"scan description must show the pruned shard set:\n${plan.take(600)}")

    val in = spark.read.format("graft-kinesis").option("service.id", id)
      .load().where(col("shardId").isin("shard-0", "shard-1", "ghost"))
    assert(in.rdd.getNumPartitions == 2)
    assert(in.count() == 100)
  }

  test("partitionKey filter prunes to the key-routed shard when " +
      "key-routing-pruning is on (point lookup reads 1 of 4 shards); " +
      "rows are still filtered (other keys share the shard)") {
    import graft.models.ProducerEvent
    import graft.sinks.ShardServiceAsyncClient
    val shardIds = (0 until 4).map(i => s"shard-$i")
    val svc = new InMemoryShardService("keyprune", shardIds)
    val client = new ShardServiceAsyncClient(svc)
    for (n <- 1 to 200)
      client.put(ProducerEvent(s"pk${n % 40}", s"$n".getBytes(UTF_8)))(_ => ())
    client.close()
    val id = ShardServiceRegistry.register(svc)

    val eq = spark.read.format("graft-kinesis").option("service.id", id)
      .option("key-routing-pruning", "true")
      .load().where(col("partitionKey") === "pk7")
    assert(eq.rdd.getNumPartitions == 1,
      "point lookup must plan only the key-routed shard")
    assert(eq.count() == 5) // n in {7,47,87,127,167}
    assert(eq.select("partitionKey").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("pk7"),
      "key filter must stay residual: only matching rows survive")
    val plan = eq.queryExecution.executedPlan.toString
    assert(plan.contains("keys=pk7"), plan.take(600))

    val in = spark.read.format("graft-kinesis").option("service.id", id)
      .option("key-routing-pruning", "true")
      .load().where(col("partitionKey").isin("pk7", "pk8"))
    assert(in.rdd.getNumPartitions <= 2)
    assert(in.count() == 10)

    // without the opt-in, the same query scans every shard
    val off = spark.read.format("graft-kinesis").option("service.id", id)
      .load().where(col("partitionKey") === "pk7")
    assert(off.rdd.getNumPartitions == 4)
    assert(off.count() == 5)
  }

  test("batch scan prunes unused envelope columns (payload bytes not " +
      "materialized for a count-style query)") {
    val id = mkService()
    val df = spark.read.format("graft-kinesis").option("service.id", id)
      .load().select(col("shardId"), col("seqNo"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-kinesis [shardId,seqNo]"),
      s"scan must be pruned to the 2 referenced columns:\n${plan.take(600)}")
  }
}
