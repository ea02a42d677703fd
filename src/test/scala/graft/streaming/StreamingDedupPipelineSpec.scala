package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import graft.SparkSpec
import graft.sources.{InMemoryShardService, RawShardRecord, ShardServiceRegistry}
import org.apache.spark.sql.functions._

/** End-to-end integration of the two halves of the engine: documents
  * arriving through the graft-kinesis DSv2 source are content-
  * fingerprinted (d02's md5) and exact-deduped ON THE STREAM with
  * `dropDuplicates` — the streaming form of d01, keeping the FIRST
  * arrival of each distinct payload across micro-batches and shards.
  * This is the "dedup at ingest time" shape of a training-data
  * pipeline: state is keyed by fingerprint (bounded by distinct
  * content, watermark-evictable in production), and offsets advance
  * independently of duplicate density.
  */
class StreamingDedupPipelineSpec extends SparkSpec {

  test("streamed exact dedup keeps the first arrival of each distinct " +
      "payload across batches and shards") {
    val texts = Seq("alpha doc", "beta doc", "alpha doc", "gamma doc",
      "beta doc", "alpha doc", "delta doc", "gamma doc")
    val svc = new InMemoryShardService("dedup-stream",
      Seq("shard-0", "shard-1"))
    // duplicates deliberately straddle shards AND positions: content i
    // goes to shard i%2 at per-shard increasing seq
    val perShardSeq = scala.collection.mutable.Map(
      "shard-0" -> 0L, "shard-1" -> 0L)
    texts.zipWithIndex.foreach { case (t, i) =>
      val shard = s"shard-${i % 2}"
      val seq = perShardSeq(shard) + 1
      perShardSeq(shard) = seq
      svc.append(shard, RawShardRecord.single(shard, BigInt(seq),
        1700000000000000L + i, t.getBytes(UTF_8)))
    }
    val id = ShardServiceRegistry.register(svc)
    val tmp = java.nio.file.Files.createTempDirectory("graft-dedup").toString
    val name = s"dedup_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.format("graft-kinesis")
      .option("service.id", id)
      // small batches so duplicates arrive in DIFFERENT micro-batches
      .option("max-records-per-shard", "1")
      .load()
      .selectExpr("shardId", "CAST(seqNo AS LONG) AS seq",
        "CAST(data AS STRING) AS text")
      .withColumn("fp", md5(encode(col("text"), "UTF-8")))
      .dropDuplicates("fp")
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", s"$tmp/chk")
      .start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // exactly one row per distinct text
    assert(out.map(_._3).sorted.toSeq ==
      Seq("alpha doc", "beta doc", "delta doc", "gamma doc"))
    // and it is the FIRST arrival: texts 0..3 are the first occurrences,
    // landing at shard i%2 seq (i/2)+1
    val byText = out.map(t => t._3 -> ((t._1, t._2))).toMap
    assert(byText("alpha doc") == (("shard-0", 1L)))
    assert(byText("beta doc") == (("shard-1", 1L)))
    assert(byText("gamma doc") == (("shard-1", 2L)))
    assert(byText("delta doc") == (("shard-0", 4L)))
  }

  test("distinct-count at ingest time: hllFold over the DSv2 source " +
      "matches the driver-side register model on the same payloads — " +
      "the sketch survives sharding AND micro-batching") {
    import spark.implicits._
    import graft.operators.StreamingOps
    import graft.operators.StreamingOps.{HashObs, HllSnapshot}
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    // payloads "key,custId" with duplicate custIds straddling shards
    val events = Seq(
      "A,101", "B,202", "A,103", "B,202", "A,101", "B,204",
      "A,105", "B,202", "A,103", "B,206", "A,107", "B,204")
    val svc = new InMemoryShardService("hll-stream",
      Seq("shard-0", "shard-1"))
    val perShardSeq = scala.collection.mutable.Map(
      "shard-0" -> 0L, "shard-1" -> 0L)
    events.zipWithIndex.foreach { case (t, i) =>
      val shard = s"shard-${i % 2}"
      val seq = perShardSeq(shard) + 1
      perShardSeq(shard) = seq
      svc.append(shard, RawShardRecord.single(shard, BigInt(seq),
        1700000000000000L + i, t.getBytes(UTF_8)))
    }
    val id = ShardServiceRegistry.register(svc)
    val tmp = java.nio.file.Files.createTempDirectory("graft-hlls").toString
    val name = s"hll_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.format("graft-kinesis")
      .option("service.id", id)
      .option("max-records-per-shard", "2") // force several micro-batches
      .load()
      .selectExpr("split(CAST(data AS STRING), ',')[0] AS key",
        "CAST(conv(substring(md5(split(CAST(data AS STRING), ',')[1]), " +
          "1, 15), 16, 10) AS LONG) AS h")
      .as[HashObs]
      .groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(StreamingOps.hllFold _)
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName(name)
      .option("checkpointLocation", s"$tmp/chk")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(name).as[HllSnapshot].collect()
      .groupBy(_.key).view.mapValues(_.maxBy(_.estimate)).toMap
    // driver model: the same observe()/estimate() over the raw payloads
    val model = events.map(_.split(",")).groupBy(_(0)).map { case (k, rows) =>
      val regs = new Array[Byte](64)
      rows.foreach { r =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(r(1).getBytes(UTF_8)).map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
        graft.functions.HllRegisterAggregate.observe(regs, h)
      }
      k -> (regs.count(_ > 0),
        graft.functions.HllRegisterAggregate.estimate(regs))
    }
    assert(streamed.keySet == model.keySet)
    streamed.foreach { case (k, snap) =>
      assert((snap.n_buckets_hit, snap.estimate) == model(k),
        s"key=$k streamed=$snap model=${model(k)}")
    }
  }

  test("decontamination at ingest time: streamed documents anti-join the " +
      "static broadcast eval-gram set (stream-static join), only clean " +
      "docs reach the sink") {
    import spark.implicits._
    val evalDocs = Seq((100L, "the quick brown fox jumps over")).toDF("doc_id", "text")
    // pre-compute the eval gram set once, as a production pipeline would
    val evalGrams = evalDocs
      .withColumn("words", split(trim(col("text")), " "))
      .select(explode(expr(
        "transform(sequence(1, size(words) - 3), " +
          "i -> array_join(slice(words, i, 4), ' '))")).as("g"))
      .distinct()
    val texts = Seq(
      (1L, "the quick brown fox went home"),     // shares "the quick brown fox"
      (2L, "entirely different content here now"), // clean
      (3L, "she saw the quick brown fox jumps"), // contaminated
      (4L, "clean text with no overlap at all")) // clean
    val svc = new InMemoryShardService("decon-stream", Seq("shard-0"))
    texts.foreach { case (i, t) =>
      svc.append("shard-0", RawShardRecord.single("pk", BigInt(i), i,
        s"$i|$t".getBytes(UTF_8)))
    }
    val id = ShardServiceRegistry.register(svc)
    val tmp = java.nio.file.Files.createTempDirectory("graft-decon").toString
    val name = s"decon_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val stream = spark.readStream.format("graft-kinesis")
      .option("service.id", id).load()
      .selectExpr("CAST(data AS STRING) AS payload")
      .select(
        split(col("payload"), "\\|").getItem(0).cast("long").as("doc_id"),
        split(col("payload"), "\\|").getItem(1).as("text"))
      .withColumn("words", split(trim(col("text")), " "))
      .withColumn("gs", expr(
        "transform(sequence(1, size(words) - 3), " +
          "i -> array_join(slice(words, i, 4), ' '))"))
      .select(col("doc_id"), col("text"), explode(col("gs")).as("g"))
      // stream-static LEFT ANTI join against the broadcast eval grams:
      // contaminated (doc, gram) rows die here, map-locally
      .join(broadcast(evalGrams), Seq("g"), "left_anti")
      .groupBy(col("doc_id"))
      // a doc survives iff ALL its grams survived the anti-join
      .agg(count(lit(1)).as("n_clean_grams"), first(col("text")).as("text"))
    val q = stream
      .writeStream.format("memory").queryName(name).outputMode("complete")
      .option("checkpointLocation", s"$tmp/chk")
      .start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table(name).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: 3 grams, 1 contaminated -> 2 clean; doc 3: 4 grams, 1 hit
    // -> 3 clean; docs 2/4: all grams clean (3 each)
    val gramCount = texts.toMap.view.mapValues(t => t.split(" ").length - 3).toMap
    assert(out(2L) == gramCount(2L) && out(4L) == gramCount(4L))
    assert(out(1L) < gramCount(1L) && out(3L) < gramCount(3L),
      s"contaminated docs must lose grams: $out vs $gramCount")
  }

  test("boilerplate stripping at ingest time: a static boilerplateSet " +
      "built on the standing corpus rewrites streamed documents " +
      "map-only (stripBoilerplateWith on micro-batches)") {
    import spark.implicits._
    import graft.operators.DedupOps
    val boiler = "subscribe to our newsletter now"  // 5-word chunk unit
    val corpus = Seq(
      (1L, s"$boiler unique alpha body text here"),
      (2L, s"$boiler another beta document body here"),
      (3L, "totally organic content with no chrome at all")).toDF("doc_id", "text")
    // built ONCE on the standing corpus (chunkWords = 5 -> the shared
    // first chunk is boilerplate, per-doc tails are not)
    val boilerSet = DedupOps.boilerplateSet(corpus, chunkWords = 5)
    val arrivals = Seq(
      (10L, s"$boiler fresh gamma arrival body text"),
      (11L, "clean streamed document with original words only"))
    val svc = new InMemoryShardService("boiler-stream", Seq("shard-0"))
    arrivals.foreach { case (i, t) =>
      svc.append("shard-0", RawShardRecord.single("pk", BigInt(i), i,
        s"$i|$t".getBytes(UTF_8)))
    }
    val id = ShardServiceRegistry.register(svc)
    val tmp = java.nio.file.Files.createTempDirectory("graft-boiler").toString
    val name = s"boiler_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val stream = spark.readStream.format("graft-kinesis")
      .option("service.id", id).option("max-records-per-shard", "1").load()
      .selectExpr("CAST(data AS STRING) AS payload")
      .select(
        split(col("payload"), "\\|").getItem(0).cast("long").as("doc_id"),
        split(col("payload"), "\\|").getItem(1).as("text"))
    val q = DedupOps.stripBoilerplateWith(stream, boilerSet, chunkWords = 5)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", s"$tmp/chk")
      .start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table(name).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(10L) == ((2L, 1L, "fresh gamma arrival body text")),
      s"boiler chunk must be stripped from the streamed doc: $out")
    assert(out(11L) ==
      ((2L, 0L, "clean streamed document with original words only")),
      s"clean doc must pass through unchanged: $out")
  }

  test("composed streamed ingest (the streaming form of Pipeline.prepare): " +
      "quality filter -> incremental exact dedup -> incremental NEAR dedup " +
      "(dedupeAgainst + nearDupeAgainst, broadcast-the-delta) -> " +
      "decontamination, end-to-end on the DSv2 source across micro-batches") {
    import spark.implicits._
    import graft.operators.{DedupOps, Pipeline}
    import org.apache.spark.sql.DataFrame
    val corpusText =
      "the corpus already holds this exact document body right here today"
    val evalText =
      "evaluation answer key the secret question phrase alpha beta gamma delta"
    // the standing 100 TB corpus and the eval set are the STATIC sides;
    // each micro-batch is the small delta that gets broadcast
    val corpus = Seq((1000L, corpusText)).toDF("doc_id", "text")
    val evalDocs = Seq((2000L, evalText)).toDF("doc_id", "text")
    val incoming = Seq(
      11L -> corpusText, // exact dup of a corpus doc -> dedupeAgainst drops
      12L -> "tiny doc", // < 10 tokens -> quality-dropped
      // (13..16 below: contaminated, clean, repetitive, near-dup)
      13L -> ("students memorize the secret question phrase alpha " +
        "carefully before their final exam"), // shares an eval 4-gram
      14L -> ("completely novel writing covering subjects nobody " +
        "mentioned anywhere else before now"), // clean -> survives
      15L -> "spam spam spam spam spam spam spam spam spam spam one two",
      // ^ distinct ratio 3/12 -> quality-dropped
      16L -> ("the corpus already holds this exact document body right " +
        "here tonight")) // NEAR-dup of the corpus doc (8 of 10 shingles
      // shared -> jaccard 0.8) -> nearDupeAgainst drops
    val svc = new InMemoryShardService("pipe-stream", Seq("shard-0", "shard-1"))
    incoming.zipWithIndex.foreach { case ((i, t), idx) =>
      svc.append(s"shard-${idx % 2}", RawShardRecord.single("pk",
        BigInt(idx / 2 + 1), idx, s"$i|$t".getBytes(UTF_8)))
    }
    val id = ShardServiceRegistry.register(svc)
    val tmp = java.nio.file.Files.createTempDirectory("graft-pipe").toString
    val survivors =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = spark.readStream.format("graft-kinesis")
      .option("service.id", id)
      // small admission so the pipeline provably composes across batches
      .option("max-records-per-shard", "1")
      .load()
      .selectExpr("CAST(data AS STRING) AS payload")
      .select(
        split(col("payload"), "\\|").getItem(0).cast("long").as("doc_id"),
        split(col("payload"), "\\|").getItem(1).as("text"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val quality = Pipeline.qualityFilter(batch)
        val dups = DedupOps.dedupeAgainst(corpus, quality)
          .select(col("batch_id").as("doc_id"))
        val fresh = quality.join(dups, Seq("doc_id"), "left_anti")
        val nearDups = DedupOps.nearDupeAgainst(corpus, fresh)
          .select(col("batch_id").as("doc_id")).distinct()
        val freshNear = fresh.join(nearDups, Seq("doc_id"), "left_anti")
        val clean = Pipeline.decontaminated(freshNear, evalDocs, n = 4)
        val rows = clean.select("doc_id", "text").as[(Long, String)].collect()
        survivors.synchronized { survivors ++= rows }
        ()
      }
      .option("checkpointLocation", s"$tmp/chk")
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(survivors.sortBy(_._1).toSeq == Seq(incoming(3)),
      s"only the clean novel doc survives; got $survivors")
  }

  test("streamed keep-first NEAR-dup with a GROWING kept corpus over the " +
      "real documents table equals the sequential greedy truth (arrival " +
      "order keep-first, exact jaccard >= 0.8)") {
    import spark.implicits._
    import graft.operators.DedupOps
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val all = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)

    // TRUTH: greedy keep-first over the exact >= 0.8 jaccard pair graph
    // (the same shingle/jaccard definition the library's incremental
    // path uses) — iterate ids ascending, keep iff no edge to an
    // already-kept doc
    val edges = DedupOps.nearDupPairs(
        all.toSeq.toDF("doc_id", "text"), 0.8)
      .select(col("doc_a"), col("doc_b"))
      .as[(Long, Long)].collect()
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val keptTruth = scala.collection.mutable.LinkedHashSet.empty[Long]
    all.foreach { case (id, _) =>
      if (!adj.getOrElse(id, Set.empty).exists(keptTruth.contains))
        keptTruth += id
    }
    assert(keptTruth.size < all.length,
      "corpus must contain near-dups for this test to mean anything")

    // STREAM: docs arrive in id order across micro-batches; each batch
    // is deduped against the kept corpus SO FAR (nearDupeAgainst,
    // broadcast-the-delta) plus greedily within itself, then the
    // winners JOIN the corpus — the growing-state ingest shape the
    // static-corpus test above cannot exercise
    val input = MemoryStream[(Long, String)](spark)
    var kept: DataFrame = Seq.empty[(Long, String)].toDF("doc_id", "text")
      .localCheckpoint(eager = true)
    val tmp = java.nio.file.Files.createTempDirectory("graft-neardup").toString
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val dupVsCorpus: Set[Long] =
          if (kept.isEmpty) Set.empty
          else DedupOps.nearDupeAgainst(kept, batch)
            .select(col("batch_id")).distinct()
            .as[Long].collect().toSet
        val withinEdges = DedupOps.nearDupPairs(batch, 0.8)
          .select(col("doc_a"), col("doc_b"))
          .as[(Long, Long)].collect()
        val wAdj = (withinEdges ++ withinEdges.map(_.swap)).groupBy(_._1)
          .view.mapValues(_.map(_._2).toSet).toMap
        val ids = batch.select(col("doc_id")).as[Long].collect().sorted
        val keepNow = scala.collection.mutable.LinkedHashSet.empty[Long]
        ids.foreach { id =>
          if (!dupVsCorpus.contains(id) &&
              !wAdj.getOrElse(id, Set.empty).exists(keepNow.contains))
            keepNow += id
        }
        val winners = batch.filter(col("doc_id").isin(keepNow.toSeq: _*))
        // lineage hygiene: cut per batch so the corpus never re-derives
        kept = kept.union(winners).localCheckpoint(eager = true)
        ()
      }
      .option("checkpointLocation", s"$tmp/chk")
      .start()
    try {
      all.grouped(100).foreach { chunk =>
        input.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = kept.select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(streamed == keptTruth.toSeq.sorted,
      s"stream kept ${streamed.size} vs truth ${keptTruth.size}")
  }
}
