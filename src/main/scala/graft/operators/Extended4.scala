package graft.operators

import graft.{Parity, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-4 widening of the analytical surface (SURVEY.md §2.2):
  *
  *  - '''Random-hyperplane LSH cosine pairs''' (e05): the sign-random-
  *    projection (SimHash-for-vectors) variant of approximate similarity
  *    search — 16 signed projections per vector, banded 4×4, candidate
  *    pairs from band-bucket collisions only, then EXACT cosine
  *    verification. This is the embedding twin of d04's MinHash+LSH: at
  *    100 TB the pair space is bounded by bucket collisions (a shuffle
  *    keyed on (band, bucket)), never O(n²). The hyperplane sign matrix
  *    is derived from md5 (portable integer/hex arithmetic — same idiom
  *    as d05/q51), so the DuckDB oracle reproduces the bucketing AND the
  *    verified cosines bit-for-bit.
  *  - '''Dynamic partition pruning''' (q57): fact table CTAS'd
  *    partitioned on the join key; the dim side carries a selective
  *    predicate on a NON-key column, so static pushdown cannot prune the
  *    fact scan — only Catalyst's runtime DPP subquery can. At 100 TB
  *    this is the difference between scanning every date/priority
  *    partition of a fact table and scanning only the 2-of-5 the dim
  *    filter selects. PlanShapeSpec pins the `dynamicpruning` partition
  *    filter so the plan can't silently regress to a full scan.
  */
object Extended4 {

  private def dropManaged(s: SparkSession, name: String): Unit =
    Extended3.dropManaged(s, name)

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** e05 geometry: 16 hyperplanes in 4 bands of 4 bits over the 64-dim
    * embeddings (TESTDATA.md). Sign(j)(i) = +1 iff the first hex digit
    * of md5("hp-j-i") is < '8' — one unbiased portable bit per
    * component, computed ONCE on the driver (the oracle derives the
    * identical matrix with SQL md5; per-row md5 would be 1024 hashes a
    * row at scale). */
  private val NPlanes = 16
  private val BandRows = 4
  private val Dims = 64
  private lazy val hyperplaneSigns: IndexedSeq[Seq[Double]] =
    (0 until NPlanes).map(j =>
      (0 until Dims).map(i =>
        if (md5hex(s"hp-$j-$i").charAt(0) < '8') 1.0 else -1.0))

  /** q75's engine over any distinct (user_id, day) frame: per day
    * n_active / n_new / n_retained / n_resurrected / n_churned with
    * churned(d) = active(d-1) - retained(d). A calendar day with zero
    * actives still gets a row when the day before had any (candidate
    * days = observed UNION observed + 1), so churn after a fully-dead
    * day is attributed instead of silently dropped — but days past the
    * last observed day are right-censored (the data ending is not
    * evidence everyone churned), so candidates are capped at
    * max(observed). The cap's global window runs over the per-day
    * rollup (calendar-bounded, thousands of rows), never the events. */
  private[graft] def growthAccounting(userDays: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val ud = userDays.withColumn("prev_day", lag(col("day"), 1).over(w))
    val daily = ud.groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("prev_day").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(datediff(col("day"), col("prev_day")) === 1, 1L)
          .otherwise(0L)).as("n_retained"),
        sum(when(col("prev_day").isNotNull
            && datediff(col("day"), col("prev_day")) > 1, 1L)
          .otherwise(0L)).as("n_resurrected"))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val capped = daily.withColumn("max_day", max(col("day")).over(wAll))
    val days = capped.select(col("day"))
      .union(capped.filter(date_add(col("day"), 1) <= col("max_day"))
        .select(date_add(col("day"), 1).as("day")))
      .distinct()
    days
      .join(daily, Seq("day"), "left")
      .join(daily.select(date_add(col("day"), 1).as("day"),
        col("n_active").as("prev_active")), Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        (coalesce(col("prev_active"), lit(0L))
          - coalesce(col("n_retained"), lit(0L))).as("n_churned"))
      .filter(col("n_active") > 0 || col("n_churned") > 0)
      .select(col("day").cast("timestamp_ntz").as("day"),
        col("n_active"), col("n_new"), col("n_retained"),
        col("n_resurrected"), col("n_churned"))
  }

  /** Bit-interleave (Morton / Z-order) of two non-negative integer
    * columns as a pure-arithmetic SQL expression — `((x div 2^i) % 2)`
    * picks bit i, scaled back to position 2i+1 (x) / 2i (y) — so the
    * identical formula runs in Spark (`divOp = "div"`) and DuckDB
    * (`divOp = "//"`). 2*`bits` result bits. */
  private[graft] def zInterleave(xc: String, yc: String, bits: Int,
      divOp: String): String =
    (0 until bits).map(i =>
      s"(($xc $divOp ${1L << i}) % 2) * ${1L << (2 * i + 1)} + " +
        s"(($yc $divOp ${1L << i}) % 2) * ${1L << (2 * i)}")
      .mkString(" + ")

  /** e05's full plan — banded sign-LSH candidates verified with the
    * exact cosine at 0.4. Shared by e05 and the e21 recall gate so the
    * gate measures exactly the pairs the scale path emits. */
  private def lshVerifiedPairs(s: SparkSession, d: String): DataFrame = {
    val dot = graft.functions.VectorFunctions.dotProduct _
    val v = Similarity.vecs(s, d)
    val withBits = (0 until NPlanes).foldLeft(v)((df, j) =>
      df.withColumn(s"bit$j",
        when(dot(col("v"), typedLit(hyperplaneSigns(j))) >= 0d, 1)
          .otherwise(0)))
    val bands: Column = array((0 until NPlanes / BandRows).map { b =>
      struct(lit(b).as("band"),
        (0 until BandRows)
          .map(r => col(s"bit${b * BandRows + r}") * lit(1 << r))
          .reduce(_ + _).as("bv"))
    }: _*)
    val buckets = withBits
      .select(col("vec_id"), explode(bands).as("e"))
      .select(col("vec_id"), col("e.band").as("band"), col("e.bv").as("bv"))
    val cand = buckets
      .select(col("vec_id").as("vec_a"), col("band"), col("bv"))
      .join(buckets.select(col("vec_id").as("vec_b"), col("band"),
        col("bv")), Seq("band", "bv"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b")).distinct()
    val va = v.select(col("vec_id").as("vec_a"), col("v").as("va"),
      col("nrm").as("na"))
    val vb = v.select(col("vec_id").as("vec_b"), col("v").as("vb"),
      col("nrm").as("nb"))
    cand.join(va, "vec_a").join(vb, "vec_b")
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= 0.4)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Z-ORDER data layout: interleave the bits of the two classic
    // filter dimensions (customer, order day) into one Morton key, so
    // sorting by z clusters BOTH dimensions at once — every run of
    // 2^18 consecutive z values is a 512x512 (custkey, day) tile. The
    // per-tile min/max spans returned here are exactly the file-footer
    // stats a z-sorted write produces, i.e. the proof that a scan
    // filtered on EITHER dimension prunes to a bounded set of tiles
    // (1-D sorting gives this for one dimension only). The cluster
    // write path is `repartitionByRange($"z").sortWithinPartitions
    // ($"z")` + parquet min/max pruning; this query computes the key
    // (one map pass) and the tile stats (one tile-keyed aggregate).
    // 16 bits per dimension covers custkey/day up to 65535 — past
    // that, widen bits (the formula, and its cost, scale linearly).
    "q77_zorder_layout" -> ((s, d) => {
      val xy = Tables.orders(s, d).select(col("o_custkey").as("x"),
        expr("CAST(datediff(o_orderdate, DATE '1995-01-01') AS BIGINT)")
          .as("y"))
      xy.withColumn("z", expr(zInterleave("x", "y", 16, "div")))
        .groupBy(expr(s"z div ${1L << 18}").as("tile"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("custkey_min"), max(col("x")).as("custkey_max"),
          min(col("y")).as("day_min"), max(col("y")).as("day_max"))
        .orderBy(col("tile"))
    }),

    // LSH-bucketed cosine pairs: candidates share >= 1 of 4 sign-bands;
    // survivors verified with the exact cosine at 0.4 (e01's threshold,
    // so e01 is the recall ground truth for this scale path).
    "e05_lsh_cosine_pairs" -> ((s, d) =>
      lshVerifiedPairs(s, d).orderBy(col("vec_a"), col("vec_b"))),

    // RH-LSH RECALL gate (m11's discipline applied to e05): the banded
    // sign-LSH pairs measured against the exhaustive cosine >= 0.4
    // ground truth (e01's frame), bucketed by similarity. Sign-band
    // collision probability is (1 - θ/π)^r per band — it RISES with
    // cosine, so any recall loss concentrates in the lowest bucket;
    // this report is what says whether 4×4-bit bands are enough or the
    // band count needs raising before e05 is trusted as the scale
    // path. Truth side is the O(n²) scan — eval-twin contract
    // (e02/e07/m11), per-bucket/sampled at corpus scale; the found
    // side is e05's real plan.
    "e21_lsh_recall" -> ((s, d) => {
      val dot = graft.functions.VectorFunctions.dotProduct _
      val v = Similarity.vecs(s, d)
      val va = v.select(col("vec_id").as("vec_a"), col("v").as("va"),
        col("nrm").as("na"))
      val vb = v.select(col("vec_id").as("vec_b"), col("v").as("vb"),
        col("nrm").as("nb"))
      val truth = va.join(vb, col("vec_a") < col("vec_b"))
        .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
        .filter(col("cos") >= 0.4)
        .select(col("vec_a"), col("vec_b"), col("cos"))
      val found = lshVerifiedPairs(s, d)
        .select(col("vec_a"), col("vec_b"), lit(1L).as("hit"))
      truth.join(found, Seq("vec_a", "vec_b"), "left")
        .groupBy(when(col("cos") < 0.6, "c04_06")
          .when(col("cos") < 0.8, "c06_08")
          .otherwise("c08_10").as("bucket"))
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_found"))
        .withColumn("recall",
          col("n_found").cast("double") / col("n_true"))
        .orderBy(col("bucket"))
    }),

    // DPP: orders partitioned by o_orderpriority; the dim is a SEPARATE
    // stored table whose urgency class is plain data (not derivable from
    // the join key by constraint propagation), so the fact scan's
    // partition filter can only come from the runtime DPP subquery over
    // the broadcast dim — the exact "scan 2 of 5 partitions because the
    // dim filter said so at runtime" shape of a warehouse star join.
    "q57_dpp_partitioned_join" -> ((s, d) => {
      dropManaged(s, "graft_orders_by_priority")
      dropManaged(s, "graft_priority_dim")
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite").format("parquet")
        .partitionBy("o_orderpriority")
        .saveAsTable("graft_orders_by_priority")
      Tables.orders(s, d)
        .select(col("o_orderpriority").as("p")).distinct()
        .withColumn("cls", substring(col("p"), 1, 1).cast("int"))
        .write.mode("overwrite").format("parquet")
        .saveAsTable("graft_priority_dim")
      val urgent = s.table("graft_priority_dim").filter(col("cls") <= 2)
      s.table("graft_orders_by_priority")
        .join(broadcast(urgent), col("o_orderpriority") === col("p"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          Parity.dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    // Closed-form per-group OLS (y = l_extendedprice on x = l_quantity):
    // the moments (n, Sx, Sy, Sxx, Sxy) accumulate as EXACT integers
    // (2dp values scaled to cents, products in DECIMAL(38,0) — the
    // 128-bit-integer idiom), so slope/intercept come out of a fixed
    // sequence of IEEE ops on exact inputs — deterministic at any
    // parallelism and bit-identical cross-engine, unlike built-in
    // corr/covar/regr_* whose double running sums are merge-order
    // dependent. Scale shape: one partial-aggregated groupBy, five
    // numbers per group on the wire; the scale factors (100x, 100y)
    // cancel in the slope quotient.
    "q58_group_linear_fit" -> ((s, d) => {
      import Parity.cents2
      val dec = DecimalType(38, 0)
      val base = Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          cents2(col("l_quantity")).cast(dec).as("xc"),
          cents2(col("l_extendedprice")).cast(dec).as("yc"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("xc")).as("sx"), sum(col("yc")).as("sy"),
          sum(col("xc") * col("xc")).as("sxx"),
          sum(col("xc") * col("yc")).as("sxy"))
      base
        .withColumn("slope",
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .withColumn("intercept",
          (col("sy").cast("double") - col("slope") * col("sx").cast("double"))
            / (col("n") * lit(100L)).cast("double"))
        .select(col("l_returnflag"), col("n"), col("slope"), col("intercept"))
        .orderBy(col("l_returnflag"))
    }),

    // Time-series gap-fill with last-observation-carried-forward,
    // JOIN-FREE: each observed hour emits itself plus the gap hours up
    // to (not including) that user's next observed hour (lead +
    // sequence explode), carrying its own rollup values — the carried
    // value IS the last observation, so LOCF needs no grid join and no
    // post-join window. All carried values are integers/strings, so
    // the fill is bit-deterministic. Scale shape: ONE rollup exchange
    // + one lead window over OBSERVED hours (pre-grid, the small
    // frame); the grid explode is row-local. The former shape (grid
    // from per-user bounds, left join, last-ignoreNulls window over
    // the full grid) re-aggregated the rollup on both join sides and
    // windowed the exploded grid — 2 extra exchanges of the biggest
    // frame; this form benched ~2x faster at sf0.1 (2.44 s -> 1.26 s).
    "q60_gapfill_locf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, d)
        .withColumn("hr", date_trunc("hour", col("ts")))
      // the hourly rollup carries the last event's TYPE via max_by, so
      // no second events scan / row-level join is needed downstream
      val hourly = e.groupBy(col("user_id"), col("hr"))
        .agg(count(lit(1)).as("n"), max(col("event_id")).as("last_eid"),
          max_by(col("event_type"), col("event_id")).as("last_type"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("obs_hr"))
      hourly
        .select(col("user_id"), col("hr").as("obs_hr"), col("n").as("obs_n"),
          col("last_eid"), col("last_type"))
        .withColumn("next_hr", lead(col("obs_hr"), 1).over(w))
        .select(col("user_id"),
          explode(expr("sequence(obs_hr, " +
            "coalesce(next_hr - interval 1 hour, obs_hr), " +
            "interval 1 hour)")).as("hr"),
          col("obs_hr"), col("obs_n"), col("last_eid"), col("last_type"))
        .select(col("user_id"), col("hr"),
          when(col("hr") === col("obs_hr"), col("obs_n")).otherwise(lit(0L))
            .as("n"),
          col("last_eid").as("locf_eid"),
          col("last_type").as("locf_type"))
        .orderBy(col("user_id"), col("hr"))
    }),

    // Sequential funnel (MATCH_RECOGNIZE-style ordered pattern): first
    // view, then the first click strictly after it, then the first
    // purchase strictly after that — per user, with the end-to-end
    // minutes. Three conditional min-aggregations, each an equi-keyed
    // join + groupBy; deterministic because every step takes a MIN.
    "q61_funnel_steps" -> ((s, d) => {
      val e = Tables.events(s, d)
      def firstAfter(df: DataFrame, typ: String, prev: DataFrame,
          prevTs: String, outTs: String): DataFrame =
        df.filter(col("event_type") === typ)
          .join(prev, "user_id")
          .filter(col("ts") > col(prevTs))
          .groupBy(col("user_id"), col(prevTs))
          .agg(min(col("ts")).as(outTs))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
      val c = firstAfter(e, "click", v, "view_ts", "click_ts")
      val p = firstAfter(e, "purchase", c, "click_ts", "purchase_ts")
      v.join(p, "user_id")
        .select(col("user_id"), col("view_ts"), col("click_ts"),
          col("purchase_ts"),
          ((expr("unix_micros(CAST(purchase_ts AS TIMESTAMP))")
            - expr("unix_micros(CAST(view_ts AS TIMESTAMP))"))
            / lit(60000000L)).cast("long").as("mins_view_to_purchase"))
        .orderBy(col("user_id"))
    }),

    // Funnel TIMING — q61 reports who converts; this reports HOW FAST:
    // exact p25/median/p75 of the time spent on each funnel edge
    // (view→click, click→purchase, view→purchase) across converting
    // users, in seconds. The latency distribution is the number a
    // growth team actually tunes against. Shape: the q61 chain (all
    // user-keyed aggregates), a row-local 3-edge explode, then one
    // exact-percentile aggregate per edge over integer-µs deltas —
    // the percentile frame is |converting users| × 3, tiny by
    // construction.
    "q81_funnel_timing" -> ((s, d) => {
      val f = queries("q61_funnel_steps")(s, d)
      def us(c: String) = expr(s"unix_micros(CAST($c AS TIMESTAMP))")
      val edges = f.select(explode(array(
        struct(lit("1_view_to_click").as("edge"),
          (us("click_ts") - us("view_ts")).as("dt_us")),
        struct(lit("2_click_to_purchase").as("edge"),
          (us("purchase_ts") - us("click_ts")).as("dt_us")),
        struct(lit("3_view_to_purchase").as("edge"),
          (us("purchase_ts") - us("view_ts")).as("dt_us")))).as("x"))
        .select(col("x.edge").as("edge"), col("x.dt_us").as("dt_us"))
      edges.groupBy(col("edge"))
        .agg(count(lit(1)).as("n"),
          (expr("percentile(dt_us, 0.25)") / 1000000.0).as("p25_s"),
          (expr("percentile(dt_us, 0.5)") / 1000000.0).as("med_s"),
          (expr("percentile(dt_us, 0.75)") / 1000000.0).as("p75_s"))
        .orderBy(col("edge"))
    }),

    // Top user JOURNEYS — the path-analysis rollup behind q71's
    // one-step transition matrix: every 3 consecutive events per user
    // forms a path trigram (view>click>purchase, ...); report the
    // top-10 corpus-wide with counts. Shape: one user-keyed window
    // pass (two leads share the frame), a rollup whose key space is
    // bounded by |event types|^3 (partial agg collapses map-side),
    // and a TakeOrdered top-10 — no global sort, ties broken by path.
    "q82_top_paths" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wTop = Window.orderBy(col("n").desc, col("path"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("t2", lead(col("event_type"), 1).over(w))
        .withColumn("t3", lead(col("event_type"), 2).over(w))
        .filter(col("t3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("t2"), col("t3"))
          .as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path")).limit(10)
        .select(row_number().over(wTop).as("rank"), col("path"), col("n"))
        .orderBy(col("rank"))
    }),

    // POINT-IN-TIME state reconstruction — the feature-store lookup
    // over q79's SCD2 intervals: each user's state exactly at every
    // observed month boundary, leakage-free by construction (an
    // interval is used only while valid_from <= T < valid_to, so no
    // future information reaches a training row stamped T). The probe
    // grid is the distinct month starts — O(calendar) rows riding a
    // broadcast — and since a user's intervals partition time, each
    // (user, snapshot) matches AT MOST one interval: no dedup pass.
    // Scale: the interval frame is the collapsed run frame, the
    // non-equi probe is against a broadcast grid (PlanLint-allowlisted
    // band-table shape, q25's precedent).
    "q83_point_in_time_state" -> ((s, d) => {
      val iv = queries("q79_scd2_history")(s, d)
      val snaps = Tables.events(s, d)
        .select(date_trunc("month", col("ts")).as("snap")).distinct()
      iv.join(broadcast(snaps),
          col("valid_from") <= col("snap") &&
            (col("valid_to").isNull || col("valid_to") > col("snap")))
        .select(col("snap"), col("user_id"), col("event_type"))
        .orderBy(col("snap"), col("user_id"))
    }),

    // CDC compaction (keep-latest-per-key): collapse an event/changelog
    // stream to each key's most recent row — the merge/upsert
    // materialization step of a warehouse ingest. Deterministic
    // tie-break: (ts, event_id) is a total order. THE SCALE POINT: this
    // is an AGGREGATION (max_by over a struct ordering key), not a
    // row_number window — partial aggregation collapses each map
    // partition to one row per key BEFORE the exchange, so the shuffle
    // carries |keys| rows, not |events|; the window form would shuffle
    // the entire changelog. (The oracle uses the window form — same
    // result, scale shape irrelevant there.)
    "q62_cdc_compact" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max_by(
          struct(col("event_id"), col("ts"), col("event_type"), col("value")),
          struct(col("ts"), col("event_id"))).as("last"))
        .select(col("user_id"),
          col("last.event_id").as("last_event_id"),
          col("last.ts").as("last_ts"),
          col("last.event_type").as("last_type"),
          col("last.value").as("last_value"))
        .orderBy(col("user_id"))
    }),

    // Incremental aggregate maintenance — the warehouse incremental-
    // refresh shape: a standing per-key aggregate (history) absorbs a
    // delta batch by MERGING partial states (count add, decimal-sum
    // add, max of maxes) through one equi full-outer join on the key —
    // history is never rescanned, which at 100 TB is the difference
    // between a refresh proportional to the delta and one proportional
    // to all of time. The sums ride a DECIMAL(18,6) carrier until
    // AFTER the merge (decimal addition is exact, so merged == full
    // recompute bit-for-bit; summing doubles per part and adding would
    // not be) — the oracle IS the full recompute, so the correctness
    // of incremental maintenance itself is what's checked.
    "q64_incremental_agg" -> ((s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val ev = Tables.events(s, d)
      def part(pred: Column): DataFrame = ev.filter(pred)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).as("dec_total"),
          max(col("ts")).as("last_ts"))
      val hist = part(col("event_id") % 10 =!= 0)
        .select(col("user_id"), col("n").as("n_h"),
          col("dec_total").as("t_h"), col("last_ts").as("ts_h"))
      val delta = part(col("event_id") % 10 === 0)
        .select(col("user_id"), col("n").as("n_d"),
          col("dec_total").as("t_d"), col("last_ts").as("ts_d"))
      val zero = lit(0).cast(DecimalType(18, 6))
      hist.join(delta, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          (coalesce(col("n_h"), lit(0L)) + coalesce(col("n_d"), lit(0L)))
            .as("n"),
          (coalesce(col("t_h"), zero) + coalesce(col("t_d"), zero))
            .cast("double").as("total_value"),
          greatest(col("ts_h"), col("ts_d")).as("last_ts"))
        .orderBy(col("user_id"))
    }),

    // Cohort retention — the classic event-analytics rollup: users
    // cohorted by first-active week, retention = distinct users of
    // cohort C active in week C+k, for every (cohort, week offset)
    // cell. Week offsets are exact integer arithmetic on epoch seconds
    // (truncated weeks differ by exact multiples of 604800), so the
    // whole matrix is integers — fully oracle-checked. Scale shape:
    // one distinct over (user, week) (map-side partial), one per-user
    // min for the cohort, one equi join on user_id, one cell groupBy —
    // every exchange keyed on user or cell, nothing event-sized past
    // the first distinct.
    "q65_cohort_retention" -> ((s, d) => {
      val active = Tables.events(s, d)
        .select(col("user_id"),
          date_trunc("week", col("ts")).as("week"))
        .distinct()
      val cohorts = active.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort"))
      active.join(cohorts, Seq("user_id"))
        .withColumn("week_offset",
          ((unix_timestamp(col("week")) - unix_timestamp(col("cohort")))
            / lit(604800L)).cast("int"))
        .groupBy(col("cohort"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort"), col("week_offset"))
    }),

    // Trailing 7-day distinct users per day (the "WAU curve") — sliding
    // COUNT(DISTINCT) has no window-frame form, and the naive shape (a
    // day x events range join) is O(days * |events|). Scale shape:
    // collapse to DISTINCT (day, user) first (key-only exchange with
    // map-side partial), then each pair fans out to the <= 7 window
    // days it contributes to (bounded in-row explode), and the final
    // per-day distinct count shuffles (day, user) keys only. The
    // observed-day semi join (drop synthetic days past the data edge)
    // broadcasts the tiny day dimension.
    "q66_trailing_distinct_users" -> ((s, d) => {
      val ud = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id"))
        .distinct()
      val cover = ud.select(
        explode(expr("sequence(day, date_add(day, 6))")).as("day"),
        col("user_id"))
      cover.join(broadcast(ud.select(col("day")).distinct()), Seq("day"),
          "left_semi")
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("users_7d"))
        // timestamp_ntz, not date: parquet date32 reaches the driver's
        // pandas compare as dtype=object and breaks its typed hash
        // (the q21 parity rule)
        .select(col("day").cast("timestamp_ntz").as("day"), col("users_7d"))
        .orderBy(col("day"))
    }),

    // Time-weighted average (TWAP): each observation's value holds
    // until the user's next event; the mean is duration-weighted —
    // the correct aggregate for irregularly-sampled series (a plain
    // AVG over-weights bursts). Exactness: durations are integer
    // microseconds, the weighted sum runs in DECIMAL (the q64 carrier
    // pattern), and the single IEEE division at the end is
    // oracle-bit-equal. Scale shape: one window + one groupBy, both
    // keyed by user_id (high cardinality, no global stage).
    "q68_time_weighted_avg" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val seg = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        // ts is TIMESTAMP_NTZ; the session is pinned UTC, so the cast
        // is wall-clock identity and unix_micros == DuckDB epoch_us
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
        .withColumn("dur_us", lead(col("us"), 1).over(w) - col("us"))
        .filter(col("dur_us").isNotNull)
      // q58's integer-moment idiom: 2dp values scale to exact cents,
      // the weighted sum is a pure INTEGER decimal, and the only
      // doubles are the final two IEEE divisions — decimal(38,>0) →
      // double conversions are NOT cross-engine bit-stable (DuckDB
      // double-rounds via 10^-scale), integer decimals are
      seg.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_segments"),
          sum(col("dur_us")).as("span_us"),
          sum(Parity.cents2(col("value")).cast(DecimalType(24, 0))
            * col("dur_us").cast(DecimalType(14, 0))).as("wsum_c"))
        .select(col("user_id"), col("n_segments"), col("span_us"),
          (col("wsum_c").cast("double") / col("span_us").cast("double")
            / lit(100.0)).as("twap"))
        .orderBy(col("user_id"))
    }),

    // Equal-width histogram with zero-filled bins — the profiling
    // primitive behind skew diagnostics and bucket sizing. Two fact
    // passes, both map-side partial aggregates (bounds, then bucket
    // counts); the data-derived bounds ride a 1-row broadcast, bucket
    // arithmetic mirrors the oracle operation-for-operation (IEEE ops
    // are deterministic, so the bin assignment is bit-identical), and
    // the zero-fill join touches only the 20-row grid.
    "q69_histogram" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_extendedprice").as("v"))
      val bounds = li.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      val bucketed = li.join(broadcast(bounds), lit(true))
        .select(least(floor((col("v") - col("lo")) * lit(20.0)
          / (col("hi") - col("lo"))).cast("int"), lit(19)).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      bounds.select(explode(sequence(lit(0), lit(19))).as("bucket"),
          col("lo"), col("hi"))
        .join(bucketed, Seq("bucket"), "left")
        .select(col("bucket"),
          (col("lo") + col("bucket").cast("double")
            * (col("hi") - col("lo")) / lit(20.0)).as("lo_edge"),
          (col("lo") + (col("bucket") + 1).cast("double")
            * (col("hi") - col("lo")) / lit(20.0)).as("hi_edge"),
          coalesce(col("cnt"), lit(0L)).as("n"))
        .orderBy(col("bucket"))
    }),

    // Growth accounting — the canonical DAU decomposition: every
    // active (user, day) is NEW (first-ever day), RETAINED (also
    // active the previous calendar day) or RESURRECTED (returning
    // after a gap), and CHURNED(d) = active(d-1) - retained(d) —
    // the identity the four series must satisfy. A calendar day with
    // ZERO actives still gets a row when the day before had any
    // (its churn must be attributed somewhere), so the candidate day
    // set is observed days UNION observed days + 1, right-censored at
    // the last observed day. Scale shape:
    // distinct (user, day) pairs, one user-keyed window (lag), then a
    // tiny per-day rollup joined to its own previous day.
    "q75_growth_accounting" -> ((s, d) => {
      growthAccounting(Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct())
        .orderBy(col("day"))
    }),

    // Deterministic grouped MODE — the most frequent value per group
    // with a total tie order (count desc, then value asc), which the
    // built-in `mode()` does not guarantee across partitionings: a
    // nondeterministic aggregate can pass one run and hash-mismatch
    // the next, so the deterministic form is the only oracle-safe one.
    // Scale shape: (group, value) partial-aggregated count, then a
    // per-group window pick — both exchanges key-only.
    "q74_grouped_mode" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("cnt").desc, col("k"))
      Tables.events(s, d)
        .select(col("event_type"),
          pmod(col("user_id"), lit(25)).as("k"))
        .groupBy(col("event_type"), col("k"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("k").as("mode_k"),
          col("cnt").as("n_occurrences"))
        .orderBy(col("event_type"))
    }),

    // Key-skew profiler — the diagnostic behind every salting /
    // broadcast decision in this library (q33 is the cure; this is the
    // instrument). Per-key counts, then the top-10 hottest keys with
    // their share of all rows, cumulative share, and skew ratio
    // (count / mean count); keys whose ratio exceeds 1.25 are flagged
    // 'salt'. Scale shape: one key-keyed partial aggregate (the only
    // exchange that sees data volume), a TakeOrdered top-10 (per-
    // partition partial top-k, no global sort), and a 1-row broadcast
    // for the corpus scalars; the rank/cum windows run over 10 rows.
    "q76_key_skew_profile" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      val scalars = counts.agg(sum(col("cnt")).as("total"),
        count(lit(1)).as("n_keys"))
      val wTop = Window.orderBy(col("cnt").desc, col("user_id"))
      val ratio = col("cnt").cast("double") * col("n_keys") / col("total")
      counts.orderBy(col("cnt").desc, col("user_id")).limit(10)
        .join(broadcast(scalars), lit(true))
        .select(row_number().over(wTop).as("rank"),
          col("user_id"), col("cnt"),
          (col("cnt").cast("double") / col("total")).as("share"),
          (sum(col("cnt")).over(wTop).cast("double") / col("total"))
            .as("cum_share"),
          ratio.as("skew_ratio"),
          when(ratio > 1.25, lit("salt")).otherwise(lit("hash-ok"))
            .as("hint"))
        .orderBy(col("rank"))
    }),

    // Column PROFILE — the catalog-statistics pass behind CBO and
    // data-quality gates: per column, row count, null count, exact
    // distinct count, and lexicographic min/max over a STABLE string
    // form (cents for the double, yyyy-MM-dd for the date — engine
    // float/timestamp rendering never enters the profile). Shape:
    // stack() unpivots to (column, value) so one generic aggregate
    // serves any schema; the exchange carries single values. At 100 TB
    // swap the exact distinct for approx_count_distinct (q29's HLL) —
    // exact distinct per column is the one genuinely expensive term.
    "q80_column_profile" -> ((s, d) => {
      val stable = Tables.orders(s, d).select(
        col("o_orderkey").cast("string").as("o_orderkey"),
        col("o_custkey").cast("string").as("o_custkey"),
        col("o_orderstatus").as("o_orderstatus"),
        Parity.cents2(col("o_totalprice")).cast("string")
          .as("o_totalprice_cents"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority").as("o_orderpriority"))
      val unpivoted = stable.select(expr(
        "stack(6, 'o_orderkey', o_orderkey, 'o_custkey', o_custkey, " +
          "'o_orderstatus', o_orderstatus, " +
          "'o_totalprice_cents', o_totalprice_cents, " +
          "'o_orderdate', o_orderdate, " +
          "'o_orderpriority', o_orderpriority) AS (column_name, v)"))
      unpivoted.groupBy(col("column_name"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col("v")).as("n_distinct"),
          min(col("v")).as("min_v"), max(col("v")).as("max_v"))
        .orderBy(col("column_name"))
    }),

    // Snapshot DIFF — the dataset-versioning primitive: which keys were
    // added, removed, or changed between two snapshots of the same
    // table (two deterministic views of orders stand in: snapshot A
    // drops keys % 3 = 0, snapshot B drops % 3 = 1 and re-prices keys
    // % 7 = 0). Rows are compared by an md5 fingerprint of their
    // STABLE string forms (cents-scaled price, yyyy-MM-dd date — the
    // double and the raw timestamp never enter a string). Scale shape:
    // the full-outer join shuffles (key, 16-byte fingerprint) only —
    // the row payload never crosses the wire; at 100 TB the changed
    // keys (a tiny set) would be joined back for their payloads.
    // 'unchanged' rows are filtered before the result leaves the join.
    "q78_snapshot_diff" -> ((s, d) => {
      val base = Tables.orders(s, d).select(col("o_orderkey").as("k"),
        col("o_custkey"), col("o_orderstatus"),
        Parity.cents2(col("o_totalprice")).as("cents"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
        col("o_orderpriority").as("op"))
      def fp(cents: Column) = md5(concat_ws("|", col("k"), col("o_custkey"),
        col("o_orderstatus"), cents, col("od"), col("op")))
      val a = base.filter(col("k") % 3 =!= 0)
        .select(col("k"), fp(col("cents")).as("fpa"))
      val b = base.filter(col("k") % 3 =!= 1)
        .select(col("k"), fp(when(col("k") % 7 === 0, col("cents") * 2)
          .otherwise(col("cents"))).as("fpb"))
      a.join(b, Seq("k"), "full")
        .select(col("k").as("o_orderkey"),
          when(col("fpa").isNull, lit("added"))
            .when(col("fpb").isNull, lit("removed"))
            .when(col("fpa") =!= col("fpb"), lit("changed"))
            .otherwise(lit("unchanged")).as("status"))
        .filter(col("status") =!= "unchanged")
        .orderBy(col("o_orderkey"))
    }),

    // SCD TYPE-2 history build — collapse an event changelog into
    // validity intervals: one row per run of consecutive equal
    // event_type per user, [valid_from, valid_to) with NULL valid_to
    // for the current state. Gaps-and-islands: a lag-change flag and
    // its running sum assign run ids in ONE user-keyed window pass
    // over the events; the interval frame that the second window
    // (valid_to = lead of the next run's start) re-shuffles is runs,
    // not events — already collapsed, orders of magnitude smaller.
    "q79_scd2_history" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val prev = lag(col("event_type"), 1).over(w)
      val runs = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("chg",
          when(prev.isNull || prev =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("run", sum(col("chg")).over(w))
        .groupBy(col("user_id"), col("run"))
        .agg(min(col("event_type")).as("event_type"),
          min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
      val w2 = Window.partitionBy(col("user_id")).orderBy(col("valid_from"))
      runs
        .select(col("user_id"), col("run"), col("event_type"),
          col("valid_from"),
          lead(col("valid_from"), 1).over(w2).as("valid_to"),
          col("n_events"))
        .orderBy(col("user_id"), col("run"))
    }),

    // Exact WEIGHTED median — q50's percentile family extended with a
    // weight column (price weighted by quantity: "the median dollar,
    // not the median line item"). All integer arithmetic: cents-scaled
    // values, integral quantities, cumulative weights as longs; the
    // median is the smallest value whose cumulative weight reaches
    // half the total (2*cw >= tw avoids any division). Scale shape:
    // pre-collapse to (group, value) bounds the window frame by
    // distinct values; one group-keyed exchange serves both the
    // cumulative and total window sums.
    "q73_weighted_median" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val g = Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          Parity.cents2(col("l_extendedprice")).as("vc"),
          col("l_quantity").cast("long").as("w"))
        .groupBy(col("l_returnflag"), col("vc"))
        .agg(sum(col("w")).as("w"))
      val wcum = Window.partitionBy(col("l_returnflag")).orderBy(col("vc"))
      val wtot = Window.partitionBy(col("l_returnflag"))
      g.withColumn("cw", sum(col("w")).over(wcum))
        .withColumn("tw", sum(col("w")).over(wtot))
        .filter(col("cw") * 2 >= col("tw"))
        .groupBy(col("l_returnflag"))
        .agg(min(col("vc")).as("med_cents"), min(col("tw")).as("total_w"))
        .select(col("l_returnflag"),
          (col("med_cents").cast("double") / 100.0).as("weighted_median"),
          col("total_w"))
        .orderBy(col("l_returnflag"))
    }),

    // RFM segmentation — the classic customer-value partitioning:
    // recency (days since last event, against the corpus max day),
    // frequency (event count), monetary (cents-exact value sum), each
    // cut into quintiles with NTILE. Determinism: every NTILE ordering
    // carries user_id as the tie-break (equal metrics would otherwise
    // tile by partition order), and monetary is integer cents, so both
    // engines tile identically. Scale shape: one user-keyed partial
    // aggregate; the corpus max day and row count are 1-row
    // broadcasts; each exact quintile is a range-partitioned global
    // rank (Packing.orderedRank) + the closed-form ntile bucket rule
    // — three parallel range exchanges over the per-user frame, no
    // single-task window at any size.
    "q72_rfm_segmentation" -> ((s, d) => {
      // the per-user rollup feeds the max-day scalar, the count scalar,
      // and the ranked base — cut it so the events scan + aggregate
      // runs once, not three times
      val perUser = Materialize.LocalCheckpoint(Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          Parity.cents2(col("value")).as("cents"))
        .groupBy(col("user_id"))
        .agg(max(col("day")).as("last_day"),
          count(lit(1)).as("n_events"),
          sum(col("cents")).as("monetary_cents")))
      val maxDay = perUser.agg(max(col("last_day")).as("corpus_max_day"))
      val nTot = perUser.agg(count(lit(1)).as("n_total"))
      // exact quintiles over |users| WITHOUT a single-task ntile window:
      // three range-partitioned global ranks (Packing.orderedRank) + the
      // closed-form ntile bucket rule. 5 = best on every axis: recency
      // DESC (most recent last), frequency/monetary ASC (highest last).
      def addQuintile(df: org.apache.spark.sql.DataFrame,
          sort: Seq[Column], name: String) =
        Packing.orderedRank(df, sort)
          .withColumn(name,
            Packing.ntileFromRank(col("rnk"), col("n_total"), 5)
              .cast("int"))
          .drop("rnk")
      val base = perUser.join(broadcast(maxDay), lit(true))
        .withColumn("recency_days",
          datediff(col("corpus_max_day"), col("last_day")))
        .crossJoin(broadcast(nTot))
      val ranked = addQuintile(
        addQuintile(
          addQuintile(base,
            Seq(col("recency_days").desc, col("user_id")), "r"),
          Seq(col("n_events"), col("user_id")), "f"),
        Seq(col("monetary_cents"), col("user_id")), "m")
      ranked.select(col("user_id"),
          col("recency_days").cast("int").as("recency_days"),
          col("n_events"), col("monetary_cents"),
          col("r"), col("f"), col("m"))
        .withColumn("rfm", col("r") * 100 + col("f") * 10 + col("m"))
        .orderBy(col("user_id"))
    }),

    // First-order behavior transition matrix: P(next event type |
    // current type) from each user's time-ordered stream — the Markov
    // summary behind funnel design and anomaly baselines (q61 checks
    // ONE fixed path; this measures every edge). Scale shape: the lag
    // window is user-keyed (high cardinality), the count rollup
    // carries 25 cells, and the per-from normalization is a window
    // over that tiny frame; probabilities are integer-exact until one
    // IEEE division.
    "q71_transition_matrix" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val tr = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
      tr.groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", col("n").cast("double")
          / sum(col("n")).over(Window.partitionBy(col("from_type")))
            .cast("double"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // Event-type co-occurrence affinity — the market-basket primitive
    // (which behaviors travel together): for every unordered type
    // pair, the number of users exhibiting both, plus the Jaccard
    // affinity n_pair / (n_a + n_b - n_pair) — integers until one
    // IEEE division, so fully oracle-checked. Scale shape: collapse
    // to DISTINCT (user, type) first (key-only exchange), then the
    // user-keyed self-join fans out to at most C(|types|, 2) = 10
    // pairs per user — bounded in-partition work, never a type-pair
    // cross product over raw events; the 5-row per-type totals
    // broadcast.
    "q70_cooccurrence_pairs" -> ((s, d) => {
      val ut = Tables.events(s, d)
        .select(col("user_id"), col("event_type")).distinct()
      val perType = ut.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_type"))
      val a = ut.select(col("user_id"), col("event_type").as("type_a"))
      val b = ut.select(col("user_id"), col("event_type").as("type_b"))
      a.join(b, Seq("user_id")).filter(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_pair"))
        .join(broadcast(perType.select(col("event_type").as("type_a"),
          col("n_type").as("n_a"))), Seq("type_a"))
        .join(broadcast(perType.select(col("event_type").as("type_b"),
          col("n_type").as("n_b"))), Seq("type_b"))
        .withColumn("affinity", col("n_pair").cast("double")
          / (col("n_a") + col("n_b") - col("n_pair")).cast("double"))
        .select(col("type_a"), col("type_b"), col("n_pair"),
          col("n_a"), col("n_b"), col("affinity"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // Unpivot (melt): the inverse of q27's pivot — wide per-type count
    // columns back to (bucket, event_type, n) long form, zero-filled
    // cells included. Pivot/unpivot round-trip pins both directions of
    // the reshape family; unpivot is a zero-shuffle per-row expansion.
    "q59_unpivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables.events(s, d)
        .withColumn("bucket", pmod(col("user_id"), lit(10)))
        .groupBy(col("bucket"))
        .pivot("event_type", types)
        .count()
      p.select(col("bucket") +: types.map(t =>
          coalesce(col(t), lit(0L)).as(t)): _*)
        .unpivot(Array(col("bucket")), types.map(col).toArray,
          "event_type", "n")
        .orderBy(col("bucket"), col("event_type"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // identical interleave arithmetic, DuckDB's // for integer division
    "q77_zorder_layout" ->
      s"""WITH xy AS (SELECT o_custkey AS x,
             CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS BIGINT)
               AS y
           FROM orders),
         zz AS (SELECT x, y, ${zInterleave("x", "y", 16, "//")} AS z
                FROM xy)
         SELECT z // ${1L << 18} AS tile, COUNT(1) AS n,
           MIN(x) AS custkey_min, MAX(x) AS custkey_max,
           MIN(y) AS day_min, MAX(y) AS day_max
         FROM zz GROUP BY 1 ORDER BY tile""",

    // same stable string forms; UNION ALL is DuckDB's unpivot
    "q80_column_profile" ->
      """WITH stable AS (SELECT
             CAST(o_orderkey AS VARCHAR) AS o_orderkey,
             CAST(o_custkey AS VARCHAR) AS o_custkey,
             o_orderstatus,
             CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
               AS o_totalprice_cents,
             strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
             o_orderpriority
           FROM orders),
         u AS (
           SELECT 'o_orderkey' AS column_name, o_orderkey AS v FROM stable
           UNION ALL SELECT 'o_custkey', o_custkey FROM stable
           UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM stable
           UNION ALL SELECT 'o_totalprice_cents', o_totalprice_cents
             FROM stable
           UNION ALL SELECT 'o_orderdate', o_orderdate FROM stable
           UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM stable)
         SELECT column_name, COUNT(1) AS n,
           CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           COUNT(DISTINCT v) AS n_distinct,
           MIN(v) AS min_v, MAX(v) AS max_v
         FROM u GROUP BY 1 ORDER BY 1""",

    // identical fingerprint recipe: stable string forms only (cents as
    // BIGINT, yyyy-MM-dd), '|' separator, md5 hex
    "q78_snapshot_diff" ->
      """WITH base AS (SELECT o_orderkey AS k, o_custkey, o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             strftime(o_orderdate, '%Y-%m-%d') AS od,
             o_orderpriority AS op
           FROM orders),
         a AS (SELECT k, md5(concat_ws('|', k, o_custkey, o_orderstatus,
                 cents, od, op)) AS fpa
               FROM base WHERE k % 3 <> 0),
         b AS (SELECT k, md5(concat_ws('|', k, o_custkey, o_orderstatus,
                 CASE WHEN k % 7 = 0 THEN cents * 2 ELSE cents END,
                 od, op)) AS fpb
               FROM base WHERE k % 3 <> 1)
         SELECT k AS o_orderkey,
           CASE WHEN fpa IS NULL THEN 'added'
                WHEN fpb IS NULL THEN 'removed'
                WHEN fpa <> fpb THEN 'changed'
                ELSE 'unchanged' END AS status
         FROM a FULL JOIN b USING (k)
         WHERE CASE WHEN fpa IS NULL THEN 'added'
                    WHEN fpb IS NULL THEN 'removed'
                    WHEN fpa <> fpb THEN 'changed'
                    ELSE 'unchanged' END <> 'unchanged'
         ORDER BY o_orderkey""",

    // run is a windowed SUM -> HUGEINT in DuckDB; cast to BIGINT
    "q79_scd2_history" ->
      """WITH c AS (SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(event_type) OVER w IS NULL
                    OR LAG(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         r AS (SELECT user_id, ts, event_id, event_type,
                 CAST(SUM(chg) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS BIGINT) AS run
               FROM c),
         g AS (SELECT user_id, run, MIN(event_type) AS event_type,
                 MIN(ts) AS valid_from, COUNT(1) AS n_events
               FROM r GROUP BY user_id, run)
         SELECT user_id, run, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
             ORDER BY valid_from) AS valid_to,
           n_events
         FROM g ORDER BY user_id, run""",

    // share/cum_share/skew_ratio are double divisions of exact integer
    // counts — bit-identical in both engines; the windowed BIGINT SUM
    // is cast to DOUBLE before dividing so no HUGEINT reaches pandas
    "q76_key_skew_profile" ->
      """WITH c AS (SELECT user_id, COUNT(1) AS cnt FROM events
                    GROUP BY user_id),
         s AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total,
                 COUNT(1) AS n_keys FROM c),
         t AS (SELECT user_id, cnt,
                 ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rank,
                 CAST(SUM(cnt) OVER (ORDER BY cnt DESC, user_id) AS DOUBLE)
                   AS ccnt
               FROM c)
         SELECT CAST(rank AS INT) AS rank, user_id, cnt,
           CAST(cnt AS DOUBLE) / s.total AS share,
           ccnt / s.total AS cum_share,
           CAST(cnt AS DOUBLE) * s.n_keys / s.total AS skew_ratio,
           CASE WHEN CAST(cnt AS DOUBLE) * s.n_keys / s.total > 1.25
                THEN 'salt' ELSE 'hash-ok' END AS hint
         FROM t, s WHERE rank <= 10 ORDER BY rank""",

    "e05_lsh_cosine_pairs" -> {
      val cosExpr =
        """list_dot_product(CAST(a.embedding AS DOUBLE[]),
                            CAST(b.embedding AS DOUBLE[])) /
           (SQRT(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                  CAST(a.embedding AS DOUBLE[]))) *
            SQRT(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[]))))"""
      s"""WITH sgn AS (
           SELECT j, list_transform(generate_series(0, ${Dims - 1}), i ->
             CASE WHEN substring(md5('hp-' || j || '-' || i), 1, 1) < '8'
                  THEN 1.0 ELSE -1.0 END) AS sv
           FROM UNNEST(generate_series(0, ${NPlanes - 1})) AS tj(j)),
         bits AS (
           SELECT e.vec_id, s.j,
             CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), s.sv)
                       >= 0 THEN 1 ELSE 0 END AS b
           FROM embeddings e CROSS JOIN sgn s),
         bands AS (
           SELECT vec_id, j // $BandRows AS band,
                  SUM(b * (1 << (j % $BandRows))) AS bv
           FROM bits GROUP BY vec_id, j // $BandRows),
         cand AS (
           SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
           FROM bands x JOIN bands y
             ON x.band = y.band AND x.bv = y.bv AND x.vec_id < y.vec_id)
         SELECT c.vec_a, c.vec_b, $cosExpr AS cos
         FROM cand c
         JOIN embeddings a ON a.vec_id = c.vec_a
         JOIN embeddings b ON b.vec_id = c.vec_b
         WHERE $cosExpr >= 0.4
         ORDER BY vec_a, vec_b"""
    },

    // e05's sign/band/candidate chain as the found side, the exhaustive
    // cosine scan as truth; n_found cast to BIGINT (SUM-int rule)
    "e21_lsh_recall" -> {
      val cosExpr =
        """list_dot_product(CAST(a.embedding AS DOUBLE[]),
                            CAST(b.embedding AS DOUBLE[])) /
           (SQRT(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                  CAST(a.embedding AS DOUBLE[]))) *
            SQRT(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[]))))"""
      s"""WITH sgn AS (
           SELECT j, list_transform(generate_series(0, ${Dims - 1}), i ->
             CASE WHEN substring(md5('hp-' || j || '-' || i), 1, 1) < '8'
                  THEN 1.0 ELSE -1.0 END) AS sv
           FROM UNNEST(generate_series(0, ${NPlanes - 1})) AS tj(j)),
         bits AS (
           SELECT e.vec_id, s.j,
             CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), s.sv)
                       >= 0 THEN 1 ELSE 0 END AS b
           FROM embeddings e CROSS JOIN sgn s),
         bands AS (
           SELECT vec_id, j // $BandRows AS band,
                  SUM(b * (1 << (j % $BandRows))) AS bv
           FROM bits GROUP BY vec_id, j // $BandRows),
         cand AS (
           SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
           FROM bands x JOIN bands y
             ON x.band = y.band AND x.bv = y.bv AND x.vec_id < y.vec_id),
         found AS (
           SELECT c.vec_a, c.vec_b
           FROM cand c
           JOIN embeddings a ON a.vec_id = c.vec_a
           JOIN embeddings b ON b.vec_id = c.vec_b
           WHERE $cosExpr >= 0.4),
         truth AS (
           SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $cosExpr AS cos
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
           WHERE $cosExpr >= 0.4)
         SELECT CASE WHEN t.cos < 0.6 THEN 'c04_06'
                     WHEN t.cos < 0.8 THEN 'c06_08'
                     ELSE 'c08_10' END AS bucket,
                COUNT(*) AS n_true,
                CAST(SUM(CASE WHEN f.vec_a IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_found,
                CAST(CAST(SUM(CASE WHEN f.vec_a IS NOT NULL THEN 1 ELSE 0
                  END) AS BIGINT) AS DOUBLE) / COUNT(*) AS recall
         FROM truth t LEFT JOIN found f
           ON t.vec_a = f.vec_a AND t.vec_b = f.vec_b
         GROUP BY 1 ORDER BY 1"""
    },

    "q57_dpp_partitioned_join" ->
      s"""SELECT o_orderpriority, COUNT(1) AS n_orders,
         ${Parity.dsumSql("o_totalprice")} AS revenue
         FROM orders
         WHERE CAST(substring(o_orderpriority, 1, 1) AS INT) <= 2
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // HUGEINT moments are DuckDB's exact-128-bit twin of Spark's
    // DECIMAL(38,0); both cast exact integers to double before the same
    // IEEE op sequence, so slope/intercept match bit-for-bit
    "q58_group_linear_fit" ->
      """WITH t AS (SELECT l_returnflag,
           CAST(round(l_quantity * 100) AS HUGEINT) AS xc,
           CAST(round(l_extendedprice * 100) AS HUGEINT) AS yc
           FROM lineitem),
         a AS (SELECT l_returnflag, COUNT(1) AS n,
           SUM(xc) AS sx, SUM(yc) AS sy,
           SUM(xc * xc) AS sxx, SUM(xc * yc) AS sxy
           FROM t GROUP BY l_returnflag)
         SELECT l_returnflag, n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
           (CAST(sy AS DOUBLE)
             - (CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             / CAST(n * 100 AS DOUBLE) AS intercept
         FROM a ORDER BY l_returnflag""",

    "q60_gapfill_locf" ->
      """WITH e AS (SELECT *, date_trunc('hour', ts) AS hr FROM events),
         hourly AS (SELECT user_id, hr, COUNT(1) AS n,
                      MAX(event_id) AS last_eid,
                      arg_max(event_type, event_id) AS last_type
                    FROM e GROUP BY 1, 2),
         bounds AS (SELECT user_id, MIN(hr) AS lo, MAX(hr) AS hi
                    FROM hourly GROUP BY 1),
         grid AS (SELECT user_id,
                    UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
                  FROM bounds)
         SELECT g.user_id, g.hr, COALESCE(h.n, 0) AS n,
                last_value(h.last_eid IGNORE NULLS) OVER w AS locf_eid,
                last_value(h.last_type IGNORE NULLS) OVER w AS locf_type
         FROM grid g LEFT JOIN hourly h
           ON h.user_id = g.user_id AND h.hr = g.hr
         WINDOW w AS (PARTITION BY g.user_id ORDER BY g.hr
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY g.user_id, g.hr""",

    "q61_funnel_steps" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS view_ts FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, v.view_ts, MIN(e.ts) AS click_ts
               FROM events e JOIN v ON e.user_id = v.user_id
               WHERE e.event_type = 'click' AND e.ts > v.view_ts
               GROUP BY e.user_id, v.view_ts),
         p AS (SELECT e.user_id, c.click_ts, MIN(e.ts) AS purchase_ts
               FROM events e JOIN c ON e.user_id = c.user_id
               WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
               GROUP BY e.user_id, c.click_ts)
         SELECT v.user_id, v.view_ts, p.click_ts, p.purchase_ts,
                (epoch_us(p.purchase_ts) - epoch_us(v.view_ts)) // 60000000
                  AS mins_view_to_purchase
         FROM v JOIN p ON p.user_id = v.user_id
         ORDER BY v.user_id""",

    // q61's chain + a 3-edge unpivot; quantile_cont mirrors Spark's
    // interpolating percentile() on the same integer-µs deltas
    "q81_funnel_timing" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS view_ts FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, v.view_ts, MIN(e.ts) AS click_ts
               FROM events e JOIN v ON e.user_id = v.user_id
               WHERE e.event_type = 'click' AND e.ts > v.view_ts
               GROUP BY e.user_id, v.view_ts),
         p AS (SELECT e.user_id, c.click_ts, MIN(e.ts) AS purchase_ts
               FROM events e JOIN c ON e.user_id = c.user_id
               WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
               GROUP BY e.user_id, c.click_ts),
         f AS (SELECT v.user_id, v.view_ts, p.click_ts, p.purchase_ts
               FROM v JOIN p ON p.user_id = v.user_id),
         edges AS (
           SELECT '1_view_to_click' AS edge,
             epoch_us(click_ts) - epoch_us(view_ts) AS dt_us FROM f
           UNION ALL SELECT '2_click_to_purchase',
             epoch_us(purchase_ts) - epoch_us(click_ts) FROM f
           UNION ALL SELECT '3_view_to_purchase',
             epoch_us(purchase_ts) - epoch_us(view_ts) FROM f)
         SELECT edge, COUNT(1) AS n,
           quantile_cont(dt_us, 0.25) / 1000000.0 AS p25_s,
           quantile_cont(dt_us, 0.5) / 1000000.0 AS med_s,
           quantile_cont(dt_us, 0.75) / 1000000.0 AS p75_s
         FROM edges GROUP BY edge ORDER BY edge""",

    "q82_top_paths" ->
      """WITH s AS (SELECT event_type,
             LEAD(event_type, 1) OVER w AS t2,
             LEAD(event_type, 2) OVER w AS t3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         c AS (SELECT event_type || '>' || t2 || '>' || t3 AS path,
                 COUNT(1) AS n
               FROM s WHERE t3 IS NOT NULL GROUP BY 1)
         SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, path) AS INT)
             AS rank,
           path, n
         FROM c QUALIFY rank <= 10 ORDER BY rank""",

    // q79's interval CTEs + a month-start probe grid; strict upper
    // bound keeps adjacent intervals non-overlapping at the boundary
    "q83_point_in_time_state" ->
      """WITH c AS (SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(event_type) OVER w IS NULL
                    OR LAG(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         r AS (SELECT user_id, ts, event_id, event_type,
                 CAST(SUM(chg) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS BIGINT) AS run
               FROM c),
         g AS (SELECT user_id, run, MIN(event_type) AS event_type,
                 MIN(ts) AS valid_from
               FROM r GROUP BY user_id, run),
         iv AS (SELECT user_id, event_type, valid_from,
                  LEAD(valid_from) OVER (PARTITION BY user_id
                    ORDER BY valid_from) AS valid_to
                FROM g),
         snaps AS (SELECT DISTINCT date_trunc('month', ts) AS snap
                   FROM events)
         SELECT snap, user_id, event_type
         FROM iv JOIN snaps
           ON valid_from <= snap
          AND (valid_to IS NULL OR valid_to > snap)
         ORDER BY snap, user_id""",

    "q62_cdc_compact" ->
      """SELECT user_id, event_id AS last_event_id, ts AS last_ts,
           event_type AS last_type, value AS last_value
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rk FROM events) t
         WHERE rk = 1 ORDER BY user_id""",

    "q65_cohort_retention" ->
      """WITH a AS (SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS week
                    FROM events),
         c AS (SELECT user_id, MIN(week) AS cohort FROM a GROUP BY user_id)
         SELECT c.cohort,
           CAST((CAST(EPOCH(a.week) AS BIGINT)
                 - CAST(EPOCH(c.cohort) AS BIGINT)) // 604800 AS INT)
             AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_users
         FROM a JOIN c USING (user_id)
         GROUP BY 1, 2 ORDER BY cohort, week_offset""",

    // full recompute over ALL events — equality with the merged
    // incremental form is exactly the property being verified
    "q64_incremental_agg" ->
      """SELECT user_id, COUNT(1) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
         MAX(ts) AS last_ts
         FROM events GROUP BY user_id ORDER BY user_id""",

    "q75_growth_accounting" ->
      """WITH ud AS (SELECT user_id, day, LAG(day) OVER
             (PARTITION BY user_id ORDER BY day) AS prev_day
           FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                 FROM events) t),
         daily AS (SELECT day, COUNT(1) AS n_active,
             CAST(SUM(CASE WHEN prev_day IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_new,
             CAST(SUM(CASE WHEN day - prev_day = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_retained,
             CAST(SUM(CASE WHEN prev_day IS NOT NULL AND day - prev_day > 1
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
           FROM ud GROUP BY day),
         days AS (SELECT day FROM daily
                  UNION SELECT day + 1 FROM daily
                  WHERE day + 1 <= (SELECT max(day) FROM daily))
         SELECT CAST(dy.day AS TIMESTAMP) AS day,
           COALESCE(d.n_active, 0) AS n_active,
           COALESCE(d.n_new, 0) AS n_new,
           COALESCE(d.n_retained, 0) AS n_retained,
           COALESCE(d.n_resurrected, 0) AS n_resurrected,
           COALESCE(p.n_active, 0) - COALESCE(d.n_retained, 0) AS n_churned
         FROM days dy
         LEFT JOIN daily d ON d.day = dy.day
         LEFT JOIN daily p ON p.day = dy.day - 1
         WHERE COALESCE(d.n_active, 0) > 0
            OR COALESCE(p.n_active, 0) - COALESCE(d.n_retained, 0) > 0
         ORDER BY dy.day""",

    "q74_grouped_mode" ->
      """WITH c AS (SELECT event_type, user_id % 25 AS k, COUNT(1) AS cnt
                    FROM events GROUP BY 1, 2)
         SELECT event_type, k AS mode_k, cnt AS n_occurrences FROM (
           SELECT event_type, k, cnt,
                  ROW_NUMBER() OVER (PARTITION BY event_type
                    ORDER BY cnt DESC, k) AS rk
           FROM c) t
         WHERE rk = 1 ORDER BY event_type""",

    "q73_weighted_median" ->
      """WITH g AS (SELECT l_returnflag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS vc,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
           FROM lineitem GROUP BY 1, 2),
         c AS (SELECT l_returnflag, vc, w,
             CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY vc)
               AS BIGINT) AS cw,
             CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
           FROM g)
         SELECT l_returnflag,
           CAST(MIN(vc) AS DOUBLE) / 100.0 AS weighted_median,
           CAST(MIN(tw) AS BIGINT) AS total_w
         FROM c WHERE cw * 2 >= tw
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q72_rfm_segmentation" ->
      """WITH pu AS (SELECT user_id, MAX(CAST(ts AS DATE)) AS last_day,
             COUNT(1) AS n_events,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
           FROM events GROUP BY user_id),
         mx AS (SELECT MAX(last_day) AS corpus_max_day FROM pu),
         t AS (SELECT user_id,
             CAST(corpus_max_day - last_day AS INT) AS recency_days,
             n_events, monetary_cents,
             NTILE(5) OVER (ORDER BY corpus_max_day - last_day DESC,
               user_id) AS r,
             NTILE(5) OVER (ORDER BY n_events, user_id) AS f,
             NTILE(5) OVER (ORDER BY monetary_cents, user_id) AS m
           FROM pu CROSS JOIN mx)
         SELECT user_id, recency_days, n_events, monetary_cents,
           CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(m AS INT) AS m,
           CAST(r * 100 + f * 10 + m AS INT) AS rfm
         FROM t ORDER BY user_id""",

    "q71_transition_matrix" ->
      """WITH tr AS (SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS to_type
           FROM events),
         c AS (SELECT from_type, to_type, COUNT(1) AS n FROM tr
               WHERE to_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, n,
           CAST(n AS DOUBLE)
             / CAST(CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
                    AS DOUBLE) AS p
         FROM c ORDER BY from_type, to_type""",

    "q70_cooccurrence_pairs" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
         pt AS (SELECT event_type, COUNT(1) AS n_type FROM ut
                GROUP BY event_type),
         pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                  COUNT(1) AS n_pair
                FROM ut a JOIN ut b ON a.user_id = b.user_id
                  AND a.event_type < b.event_type
                GROUP BY 1, 2)
         SELECT pr.type_a, pr.type_b, pr.n_pair,
           pa.n_type AS n_a, pb.n_type AS n_b,
           CAST(pr.n_pair AS DOUBLE)
             / CAST(pa.n_type + pb.n_type - pr.n_pair AS DOUBLE)
             AS affinity
         FROM pr JOIN pt pa ON pa.event_type = pr.type_a
         JOIN pt pb ON pb.event_type = pr.type_b
         ORDER BY type_a, type_b""",

    "q68_time_weighted_avg" ->
      """WITH seg AS (
           SELECT user_id, value,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) - epoch_us(ts) AS dur_us
           FROM events)
         SELECT user_id, COUNT(1) AS n_segments,
           CAST(SUM(dur_us) AS BIGINT) AS span_us,
           CAST(SUM(CAST(ROUND(value * 100) AS DECIMAL(24,0))
                    * CAST(dur_us AS DECIMAL(14,0))) AS DOUBLE)
             / CAST(CAST(SUM(dur_us) AS BIGINT) AS DOUBLE) / 100.0 AS twap
         FROM seg WHERE dur_us IS NOT NULL
         GROUP BY user_id ORDER BY user_id""",

    "q69_histogram" ->
      """WITH b AS (SELECT MIN(l_extendedprice) AS lo,
                           MAX(l_extendedprice) AS hi FROM lineitem),
         bk AS (SELECT LEAST(CAST(FLOOR((l_extendedprice - b.lo) * 20.0
                    / (b.hi - b.lo)) AS INT), 19) AS bucket,
                  COUNT(1) AS cnt
                FROM lineitem, b GROUP BY 1),
         g AS (SELECT UNNEST(generate_series(0, 19)) AS bucket)
         SELECT CAST(g.bucket AS INT) AS bucket,
           b.lo + CAST(g.bucket AS DOUBLE) * (b.hi - b.lo) / 20.0
             AS lo_edge,
           b.lo + CAST(g.bucket + 1 AS DOUBLE) * (b.hi - b.lo) / 20.0
             AS hi_edge,
           COALESCE(bk.cnt, 0) AS n
         FROM g CROSS JOIN b LEFT JOIN bk USING (bucket)
         ORDER BY bucket""",

    "q66_trailing_distinct_users" ->
      """WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
                     FROM events),
         days AS (SELECT DISTINCT day FROM ud)
         SELECT CAST(d.day AS TIMESTAMP) AS day,
                COUNT(DISTINCT u.user_id) AS users_7d
         FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
         GROUP BY d.day ORDER BY d.day""",

    "q59_unpivot" ->
      """WITH b AS (SELECT DISTINCT user_id % 10 AS bucket FROM events),
         t AS (SELECT UNNEST(['click','error','purchase','signup','view'])
                 AS event_type),
         c AS (SELECT user_id % 10 AS bucket, event_type, COUNT(1) AS n
               FROM events GROUP BY 1, 2)
         SELECT b.bucket, t.event_type, COALESCE(c.n, 0) AS n
         FROM b CROSS JOIN t
         LEFT JOIN c ON c.bucket = b.bucket AND c.event_type = t.event_type
         ORDER BY b.bucket, t.event_type"""
  )
}
