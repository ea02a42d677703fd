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
