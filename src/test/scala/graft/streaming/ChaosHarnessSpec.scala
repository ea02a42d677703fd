package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import graft.SparkSpec
import graft.config.ConsumerConf
import graft.sources.{InMemoryShardService, RawShardRecord,
  ShardServiceRegistry}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Chaos tests for the commit harness and sink (round-8 verdict item 4):
  * the reference pins loss/dup-freedom under FAILURE (pit stops,
  * reference it/SimpleKinesisConsumer.scala:99-121); here task-level
  * faults are injected via `TaskContext.attemptNumber` (the shared
  * session runs local[4, 2], so one retry is available) into the read
  * pipeline, the S3/S8 retry/dead-letter harness, and the sink's
  * abort-then-retry path — and the replay contiguity + exactly-once-
  * per-WAL invariants must survive every one of them.
  */
class ChaosHarnessSpec extends SparkSpec {

  /** Attempt 0 of partition 0 throws AFTER the iterator starts being
    * consumed (the RetryDeterminismSpec injection, applied per stage). */
  private def flaky[T](ds: Dataset[T]): Dataset[T] = {
    implicit val enc = ds.encoder
    ds.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0)
        throw new RuntimeException("injected first-attempt failure")
      it
    }
  }

  /** Attempt 0 of partition 0 passes `passFirst` rows THEN throws —
    * the mid-write fault that leaves a sink task with records already
    * sent when abort() runs. */
  private def flakyMid[T](ds: Dataset[T], passFirst: Int): Dataset[T] = {
    implicit val enc = ds.encoder
    ds.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0) {
        var n = 0
        it.map { r =>
          n += 1
          if (n > passFirst)
            throw new RuntimeException("injected mid-write failure")
          r
        }
      } else it
    }
  }

  private def mkStream(name: String, shards: Int,
      perShard: Int): (String, InMemoryShardService) = {
    val svc = new InMemoryShardService(name,
      (0 until shards).map(i => s"shard-$i"))
    for (s <- 0 until shards; n <- 1 to perShard)
      svc.append(s"shard-$s", RawShardRecord.single(s"pk$n", BigInt(n),
        n.toLong, s"$n".getBytes(UTF_8)))
    (ShardServiceRegistry.register(svc), svc)
  }

  test("source replay under injected task failures: committed output " +
      "keeps per-shard contiguity and exactly-once (the pit-stop " +
      "invariant survives one task retry per micro-batch)") {
    val (id, _) = mkStream("chaos-src", 4, 1000)
    val tmp = java.nio.file.Files.createTempDirectory("graft-chaos1")
    val out = s"$tmp/out"
    val q = spark.readStream.format("graft-kinesis")
      .option("service.id", id)
      .option("initial-position", "TRIM_HORIZON")
      .option("max-records-per-shard", "300") // 4 micro-batches
      .load()
      .select(col("shardId"), col("seqNo").cast("long").as("seq"))
      .writeStream
      .option("checkpointLocation", s"$tmp/chk")
      .foreachBatch { (ds: Dataset[Row], _: Long) =>
        // the fault fires inside the batch's write job: attempt 0 of
        // partition 0 dies mid-scan, the retried task must re-produce
        // the identical rows and the commit protocol must keep exactly
        // one copy
        flaky(ds).write.mode("append").parquet(out)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000L), "stream must drain")
    val rows = spark.read.parquet(out)
      .select(col("shardId"), col("seq")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length === 4000, "exactly-once: no loss, no duplication")
    assert(rows.distinct.length === 4000)
    // contiguity per shard: every seq 1..1000 present exactly once
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1L to 1000L),
        s"gap or duplicate in $shard")
    }
  }

  test("S3/S8 harness under injected task failures: dead letters land " +
      "exactly once, offsets advance, persistent failures never block " +
      "the stream") {
    val (id, _) = mkStream("chaos-dl", 4, 1000)
    val tmp = java.nio.file.Files.createTempDirectory("graft-chaos2")
    val dl = s"$tmp/dead"
    val conf = ConsumerConf("chaos-dl", "chaos-app",
      failedMessageRetries = 1, failureTolerancePercentage = 5.0)
    val stream = spark.readStream.format("graft-kinesis")
      .option("service.id", id)
      .option("initial-position", "TRIM_HORIZON")
      .option("max-records-per-shard", "300")
      .load()
      .select(col("shardId"), col("seqNo").cast("long").as("seq"))
    // task-level chaos BELOW the harness (the scan side of each batch)
    val chaotic = flaky(stream)
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(chaotic.schema)
    // per-record semantics: seq % 97 == 0 fails persistently (every
    // attempt) -> must dead-letter; everything else succeeds
    val q = CommitHarness.runStream[Row](chaotic,
      (r: Row) => r.getLong(1) % 97L != 0L,
      conf, Some(dl), s"$tmp/chk")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000L), "stream must drain")
    val dead = spark.read.parquet(dl).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = for (s <- 0 until 4; n <- 1 to 1000 if n % 97 == 0)
      yield (s"shard-$s", n.toLong)
    assert(dead.sorted.toSeq === expected.sorted,
      "dead letters: exactly the persistent failures, each exactly once")
  }

  test("sink abort-then-retry with the idempotent producer: a mid-write " +
      "task failure leaves the stream exactly-once") {
    import spark.implicits._
    val svc = new InMemoryShardService("chaos-sink", Seq("s0", "s1"))
    val id = ShardServiceRegistry.register(svc)
    val df = (1 to 500)
      .map(n => (s"key-${n % 11}", s"payload-$n", s"rid-$n"))
      .toDF("partitionKey", "payload", "record_id")
      .select(col("partitionKey"), encode(col("payload"), "UTF-8").as("data"),
        col("record_id"))
      .coalesce(1)
    // aggregation-max-count=1: every put ships immediately, so the
    // fault (after 250 rows) aborts a task that has already SENT 250
    // records — the retry re-sends all 500 and the transport's dedup
    // window must drop the 250 re-sends
    flakyMid(df, 250).write.format("graft-kinesis")
      .option("service.id", id)
      .option("aggregation-max-count", "1")
      .option("idempotency-column", "record_id")
      .mode("append").save()
    val got = spark.read.format("graft-kinesis").option("service.id", id)
      .load().selectExpr("CAST(data AS STRING)").collect()
      .map(_.getString(0))
    assert(got.length === 500, "exactly-once under abort-then-retry")
    assert(got.toSet === (1 to 500).map(n => s"payload-$n").toSet)
  }

  test("sink abort-then-retry WITHOUT idempotency: at-least-once — " +
      "duplicates possible, loss impossible") {
    import spark.implicits._
    val svc = new InMemoryShardService("chaos-sink2", Seq("s0", "s1"))
    val id = ShardServiceRegistry.register(svc)
    val df = (1 to 500).map(n => (s"key-${n % 11}", s"payload-$n"))
      .toDF("partitionKey", "payload")
      .select(col("partitionKey"), encode(col("payload"), "UTF-8").as("data"))
      .coalesce(1)
    flakyMid(df, 250).write.format("graft-kinesis")
      .option("service.id", id)
      .option("aggregation-max-count", "1")
      .mode("append").save()
    val got = spark.read.format("graft-kinesis").option("service.id", id)
      .load().selectExpr("CAST(data AS STRING)").collect()
      .map(_.getString(0))
    assert(got.length >= 500, "at-least-once: nothing lost")
    assert(got.toSet === (1 to 500).map(n => s"payload-$n").toSet,
      "every payload present; duplicates only from the aborted attempt")
  }
}
