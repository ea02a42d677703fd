package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** SURVEY.md §2.2 streaming rows that only make sense on an unbounded
  * Dataset: watermark late-data drop, stream-stream join with state TTL,
  * stream-static enrichment, dropDuplicates(WithinWatermark), and
  * batch/stream plan equivalence for the windowed aggregates that the
  * DuckDB oracle checks in batch form.
  */
class EventTimeStreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumbling-window agg: identical plan runs on a stream; late data " +
      "beyond the watermark is dropped") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-et").toString
    val input = MemoryStream[(Timestamp, String)](spark)
    val agg = input.toDS().toDF("ts", "event_type")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("et_tumbling")
      .option("checkpointLocation", s"$tmp/chk").start()
    try {
      input.addData((ts(0), "a"), (ts(1), "a"), (ts(6), "b"))
      q.processAllAvailable()
      // advance watermark far past the first windows
      input.addData((ts(40), "c"))
      q.processAllAvailable()
      // late arrival for the 10:00 window — beyond watermark, dropped
      input.addData((ts(2), "a"))
      // flush: push watermark further so any (wrongly) accepted late row
      // would have been emitted
      input.addData((ts(55), "c"))
      q.processAllAvailable()
      val rows = spark.table("et_tumbling")
        .select("ws", "event_type", "n").as[(Timestamp, String, Long)]
        .collect().toSet
      assert(rows.contains((ts(0), "a", 2L)), s"got $rows") // late row NOT counted
      assert(rows.contains((ts(5), "b", 1L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups a stream by key") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-et").toString
    val input = MemoryStream[(Timestamp, Long)](spark)
    val dedup = input.toDS().toDF("ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = dedup.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("et_dedup")
      .option("checkpointLocation", s"$tmp/chk").start()
    try {
      input.addData((ts(0), 1L), (ts(1), 1L), (ts(2), 2L))
      q.processAllAvailable()
      input.addData((ts(3), 2L), (ts(4), 3L))
      q.processAllAvailable()
      input.addData((ts(50), 99L)) // close windows
      q.processAllAvailable()
      val ids = spark.table("et_dedup").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L, 99L))
    } finally q.stop()
  }

  test("stream-stream inner join within watermark + time-range condition " +
      "(the reference leaves this to user code entirely)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-et").toString
    val clicks = MemoryStream[(Timestamp, Long)](spark)
    val views = MemoryStream[(Timestamp, Long)](spark)
    val c = clicks.toDS().toDF("c_ts", "c_user").withWatermark("c_ts", "20 minutes")
    val v = views.toDS().toDF("v_ts", "v_user").withWatermark("v_ts", "20 minutes")
    val joined = c.join(v,
      col("c_user") === col("v_user") &&
        col("v_ts") >= col("c_ts") &&
        col("v_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"))
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("et_ssj")
      .option("checkpointLocation", s"$tmp/chk").start()
    try {
      clicks.addData((ts(0), 7L), (ts(0), 8L))
      views.addData((ts(5), 7L), (ts(30), 8L)) // 8's view outside range
      q.processAllAvailable()
      clicks.addData((ts(59), 1L)); views.addData((ts(59), 2L))
      q.processAllAvailable()
      val got = spark.table("et_ssj").select("c_user", "v_user")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((7L, 7L)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join emits the unmatched left row with " +
      "nulls once the watermark passes the join window (state eviction, " +
      "not data loss)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-et").toString
    val clicks = MemoryStream[(Timestamp, Long)](spark)
    val views = MemoryStream[(Timestamp, Long)](spark)
    val c = clicks.toDS().toDF("c_ts", "c_user").withWatermark("c_ts", "5 minutes")
    val v = views.toDS().toDF("v_ts", "v_user").withWatermark("v_ts", "5 minutes")
    val joined = c.join(v,
      col("c_user") === col("v_user") &&
        col("v_ts") >= col("c_ts") &&
        col("v_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"),
      "leftOuter")
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("et_ssj_left")
      .option("checkpointLocation", s"$tmp/chk").start()
    try {
      clicks.addData((ts(0), 7L), (ts(0), 8L))
      views.addData((ts(5), 7L)) // 7 matches; 8 never will
      q.processAllAvailable()
      // advance both watermarks far past click(0)'s join window so the
      // unmatched left row is evictable and must be emitted with nulls
      clicks.addData((ts(60), 1L)); views.addData((ts(60), 2L))
      q.processAllAvailable()
      clicks.addData((ts(90), 1L)); views.addData((ts(90), 2L))
      q.processAllAvailable()
      val got = spark.table("et_ssj_left")
        .select(col("c_user"), col("v_user"))
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
      assert(got.contains((7L, 7L)), s"matched pair missing: $got")
      assert(got.contains((8L, -1L)),
        s"unmatched left row must surface with null right side: $got")
    } finally q.stop()
  }

  test("stream-static enrichment join against a dimension table") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-et").toString
    val dim = Seq((0L, "bronze"), (1L, "silver"), (2L, "gold"))
      .toDF("tier_id", "tier")
    val input = MemoryStream[(Timestamp, Long)](spark)
    val enriched = input.toDS().toDF("ts", "user_id")
      .withColumn("tier_id", pmod(col("user_id"), lit(3)))
      .join(broadcast(dim), "tier_id")
    val q = enriched.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("et_enrich")
      .option("checkpointLocation", s"$tmp/chk").start()
    try {
      input.addData((ts(0), 10L), (ts(1), 11L), (ts(2), 12L))
      q.processAllAvailable()
      val got = spark.table("et_enrich").select("user_id", "tier")
        .as[(Long, String)].collect().toSet
      assert(got == Set((10L, "silver"), (11L, "gold"), (12L, "bronze")))
    } finally q.stop()
  }

  test("session window with gap runs on a stream (append after watermark)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-et").toString
    val input = MemoryStream[(Timestamp, Long)](spark)
    val agg = input.toDS().toDF("ts", "user_id")
      .withWatermark("ts", "5 minutes")
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("ss"),
        col("session_window.end").as("se"), col("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("et_session")
      .option("checkpointLocation", s"$tmp/chk").start()
    try {
      // user 1: two events 3 min apart (one session), then a 20-min gap
      input.addData((ts(0), 1L), (ts(3), 1L))
      q.processAllAvailable()
      input.addData((ts(23), 1L))
      q.processAllAvailable()
      input.addData((ts(59), 9L)) // advance watermark, close sessions
      q.processAllAvailable()
      val rows = spark.table("et_session")
        .select("user_id", "ss", "se", "n")
        .as[(Long, Timestamp, Timestamp, Long)].collect().filter(_._1 == 1L)
        .sortBy(_._2.getTime)
      assert(rows.length == 2, s"got ${rows.toSeq}")
      assert(rows(0) == ((1L, ts(0), ts(13), 2L)))  // merged session
      assert(rows(1) == ((1L, ts(23), ts(33), 1L)))
    } finally q.stop()
  }

  test("batch and stream produce identical results for the oracle-checked " +
      "tumbling aggregate (plan equivalence)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-et").toString
    val data = (0 until 120).map(i => (ts(i % 60), if (i % 2 == 0) "a" else "b"))
    def plan(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val batch = plan(data.toDF("ts", "event_type"))
      .as[(Timestamp, String, Long)].collect().toSet
    val input = MemoryStream[(Timestamp, String)](spark)
    val q = plan(input.toDS().toDF("ts", "event_type"))
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("et_equiv")
      .option("checkpointLocation", s"$tmp/chk").start()
    try {
      data.grouped(50).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      val stream = spark.table("et_equiv")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(stream == batch)
    } finally q.stop()
  }

  test("stream-stream AS-OF enrichment (q26 semantics): watermarked " +
      "interval join + latest-signup pick over the real events table " +
      "equals the batch as-of rows bit-for-bit") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // batch truth: q26's (purchase_id, user_id, signup_id); null -> -1
    val expected = graft.SparkEntry.queries("q26_asof_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq.sorted

    // the same rows as two event-time-ordered streams (arrival follows
    // event time per chunk, so a short watermark delay is sound)
    // events.ts is TIMESTAMP_NTZ (nanos-truncated) -> LocalDateTime;
    // only ORDERING matters here (output columns are ids), so the
    // NTZ->Timestamp reinterpretation is harmless
    def toTs(v: Any): Timestamp = v match {
      case t: Timestamp => t
      case l: java.time.LocalDateTime => Timestamp.valueOf(l)
    }
    val ev = graft.Tables.events(spark, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .collect()
      .sortBy(r => (toTs(r.get(1)).getTime, r.getLong(0)))

    val signups = MemoryStream[(Long, Timestamp, Long)](spark)
    val purchases = MemoryStream[(Long, Timestamp, Long)](spark)
    // NOTE: no in-query sentinel filter — a predicate on these columns
    // pushes below the EventTimeWatermark node (even from after the
    // agg, via grouping-key pushdown) and the flush sentinels would
    // never reach the watermark tracker; sentinels are dropped
    // driver-side after collect instead
    val s = signups.toDS().toDF("signup_id", "s_ts", "s_user")
      .withWatermark("s_ts", "10 minutes")
    val p = purchases.toDS().toDF("purchase_id", "p_ts", "p_user")
      .withWatermark("p_ts", "10 minutes")
    // STREAMING as-of through the library surface (StreamOps.asOfEnrich:
    // interval join with a declared lookback TTL — state boundedness
    // requires one, same contract as Flink's interval join; 60 days
    // covers this table's 30-day span — + latest-(ts,id) pick per
    // purchase, leftOuter keeping no-preceding-signup purchases).
    val asof = StreamOps.asOfEnrich(
        left = p, right = s,
        keyEq = col("s_user") === col("p_user"),
        leftTs = col("p_ts"), rightTs = col("s_ts"),
        lookback = "60 days",
        leftCols = Seq(col("purchase_id"), col("p_user")),
        pick = Seq(col("signup_id")))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("signup_id"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-asof").toString
    val q = asof.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("et_asof")
      .option("checkpointLocation", s"$tmp/chk").start()
    try {
      ev.grouped(100).foreach { chunk =>
        val sg = chunk.filter(_.getString(3) == "signup")
          .map(r => (r.getLong(0), toTs(r.get(1)), r.getLong(2)))
        val pu = chunk.filter(_.getString(3) == "purchase")
          .map(r => (r.getLong(0), toTs(r.get(1)), r.getLong(2)))
        if (sg.nonEmpty) signups.addData(sg.toIndexedSeq: _*)
        if (pu.nonEmpty) purchases.addData(pu.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      // push BOTH watermarks (global watermark = min across inputs)
      // past every join window and agg window; a second flush closes
      // the windows the first one's rows finalized (a batch runs with
      // the watermark computed from the PREVIOUS batch's stats)
      for (y <- Seq("2030", "2031")) {
        val flush = Timestamp.valueOf(s"$y-01-01 00:00:00")
        signups.addData((-1L, flush, -1L))
        purchases.addData((-1L, flush, -1L))
        q.processAllAvailable()
      }
      val got = spark.table("et_asof")
        .collect().filter(_.getLong(0) >= 0) // drop flush sentinels
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq.sorted
      assert(got.size == expected.size,
        s"stream emitted ${got.size} rows, batch ${expected.size}")
      assert(got == expected)
    } finally q.stop()
  }
}
