package graft.sinks

import graft.SparkSpec
import graft.sources.{InMemoryShardService, ShardServiceRegistry}
import org.apache.spark.sql.functions._

/** The DSv2 write path: `df.write.format("graft-kinesis")` and
  * `df.writeStream.format("graft-kinesis")` land records in the stream
  * with the same routing/aggregation/idempotency semantics as the
  * ForeachWriter facade — egress as a first-class format target.
  */
class FormatWriteSpec extends SparkSpec {

  private def newStream(name: String): (String, InMemoryShardService) = {
    val svc = new InMemoryShardService(name, (0 until 4).map(i => s"shard-$i"))
    (ShardServiceRegistry.register(svc), svc)
  }

  private def producerFrame(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (s"key-${i % 11}", s"payload-$i", s"rec-$i"))
      .toDF("partitionKey", "payload", "record_id")
      .select(col("partitionKey"), encode(col("payload"), "UTF-8").as("data"),
        col("record_id"))
  }

  test("batch df.write.format(graft-kinesis) round-trips through the " +
      "source") {
    val (id, _) = newStream("fw-batch")
    producerFrame(300).write.format("graft-kinesis")
      .option("service.id", id).mode("append").save()
    val back = spark.read.format("graft-kinesis").option("service.id", id)
      .load().selectExpr("CAST(data AS STRING) AS p", "partitionKey")
    assert(back.count() == 300)
    assert(back.select("p").collect().map(_.getString(0)).toSet ==
      (1 to 300).map(i => s"payload-$i").toSet)
    // same-key records stay shard-sticky through the format path too
    val keyShards = spark.read.format("graft-kinesis")
      .option("service.id", id).load()
      .select("partitionKey", "shardId").distinct()
      .groupBy("partitionKey").count().collect()
    assert(keyShards.forall(_.getLong(1) == 1))
  }

  test("rate-limit-per-shard throttles the DSv2 write path too: a " +
      "single-task batch write above the cap is paced, nothing lost " +
      "(single-shard stream, so every record shares one shard bucket)") {
    // one shard: the per-shard cap applies to ALL traffic — the multi-
    // shard joint/independent bucket behavior is pinned in
    // GraftKinesisSinkSpec's per-shard rate cap case
    val svc = new InMemoryShardService("fw-rate", Seq("shard-0"))
    val id = ShardServiceRegistry.register(svc)
    val t0 = System.nanoTime()
    producerFrame(300).repartition(1).write.format("graft-kinesis")
      .option("service.id", id)
      .option("rate-limit-per-shard", "600")
      .mode("append").save()
    val elapsed = (System.nanoTime() - t0) * 1e-9 // sec
    val total = svc.listShards()
      .map(s => svc.read(s, graft.sources.ShardPos.Beginning,
        svc.latestPosition(s)).map(_.subRecords.size).sum).sum
    assert(total == 300, s"expected all 300 records delivered, got $total")
    assert(elapsed >= 0.4,
      f"300 records at cap 600/s must take >= ~0.5s; took $elapsed%.2fs")
  }

  test("streaming writeStream.format(graft-kinesis): source-to-sink " +
      "pipe, exactly the input lands in the target stream") {
    val (srcId, srcSvc) = newStream("fw-src")
    val (dstId, _) = newStream("fw-dst")
    for (n <- 1 to 200)
      srcSvc.append(s"shard-${n % 4}", graft.sources.RawShardRecord.single(
        s"pk-${n % 7}", BigInt(n), n.toLong,
        s"$n".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val tmp = java.nio.file.Files.createTempDirectory("graft-fw").toString
    val q = spark.readStream.format("graft-kinesis")
      .option("service.id", srcId).load()
      .select(col("partitionKey"), col("data"))
      .writeStream.format("graft-kinesis")
      .option("service.id", dstId)
      .option("checkpointLocation", s"$tmp/chk")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.format("graft-kinesis").option("service.id", dstId)
      .load().selectExpr("CAST(data AS STRING) AS p")
      .collect().map(_.getString(0).toInt).toSet
    assert(got == (1 to 200).toSet)
  }

  test("format write validates the producer-record shape at planning " +
      "time (missing/wrongly-typed columns fail before any task runs)") {
    import spark.implicits._
    val (id, _) = newStream("fw-schema")
    val noData = Seq(("k", "v")).toDF("partitionKey", "notData")
    val e1 = intercept[Exception] {
      noData.write.format("graft-kinesis").option("service.id", id)
        .mode("append").save()
    }
    assert(e1.getMessage.contains("data"), e1.getMessage)
    val wrongType = Seq(("k", "plain-string")).toDF("partitionKey", "data")
    val e2 = intercept[Exception] {
      wrongType.write.format("graft-kinesis").option("service.id", id)
        .mode("append").save()
    }
    assert(e2.getMessage.contains("BinaryType") ||
      e2.getMessage.contains("binary"), e2.getMessage)
  }

  test("format write honors the idempotency column: duplicate batch " +
      "write is dropped at the transport") {
    val (id, _) = newStream("fw-idem")
    val df = producerFrame(100).coalesce(1)
    def writeOnce(): Unit = df.write.format("graft-kinesis")
      .option("service.id", id)
      .option("idempotency-column", "record_id")
      .mode("append").save()
    writeOnce(); writeOnce()
    assert(spark.read.format("graft-kinesis").option("service.id", id)
      .load().count() == 100)
  }

  test("format write pins the idempotency column to StringType at " +
      "planning time (non-string would CCE on executors otherwise)") {
    import spark.implicits._
    val (id, _) = newStream("fw-idem-type")
    val df = Seq(("k", "p", 7L)).toDF("partitionKey", "payload", "record_id")
      .select(col("partitionKey"), encode(col("payload"), "UTF-8").as("data"),
        col("record_id"))
    val e = intercept[Exception] {
      df.write.format("graft-kinesis").option("service.id", id)
        .option("idempotency-column", "record_id").mode("append").save()
    }
    assert(e.getMessage.contains("StringType"), e.getMessage)
  }

  test("format write fails fast on a null idempotency value") {
    import spark.implicits._
    val (id, _) = newStream("fw-idem-null")
    val df = Seq(("k1", "p1", "r1"), ("k2", "p2", null))
      .toDF("partitionKey", "payload", "record_id")
      .select(col("partitionKey"), encode(col("payload"), "UTF-8").as("data"),
        col("record_id"))
    val e = intercept[Exception] {
      df.coalesce(1).write.format("graft-kinesis").option("service.id", id)
        .option("idempotency-column", "record_id").mode("append").save()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).mkString(" | ")
    assert(chain.contains("null"), chain)
  }

  test("format write honors producer aggregation config: max-count packs " +
      "sub-records into one wire record; aggregation-enabled=false " +
      "disables packing (same semantics as the ForeachWriter facade)") {
    // default conf: aggregation on (KPL AggregationEnabled, max 500) ->
    // one wire record per shard buffer flushed at commit
    val (idOn, _) = newStream("fw-agg-on")
    producerFrame(100).coalesce(1).write.format("graft-kinesis")
      .option("service.id", idOn).mode("append").save()
    def wireAndUser(id: String): (Long, Long) = {
      val df = spark.read.format("graft-kinesis").option("service.id", id).load()
      (df.select("shardId", "seqNo").distinct().count(), df.count())
    }
    val (wireOn, userOn) = wireAndUser(idOn)
    assert(userOn == 100)
    assert(wireOn <= 4, s"expected one wire record per shard, got $wireOn")

    val (idOff, _) = newStream("fw-agg-off")
    producerFrame(100).coalesce(1).write.format("graft-kinesis")
      .option("service.id", idOff)
      .option("aggregation-enabled", "false").mode("append").save()
    val (wireOff, userOff) = wireAndUser(idOff)
    assert(userOff == 100)
    assert(wireOff == 100, s"aggregation off must mean 1 record per event, got $wireOff")
  }
}
