package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Ninth analytics batch: statistical-dependence and graph-centrality
  * tables — a chi-square association screen (is priority mix independent
  * of customer segment), an exponentially-weighted revenue trend (the
  * smoothing companion to q88's raw WoW deltas), and an iterative
  * integer-arithmetic PageRank over the part co-purchase graph (the only
  * iterative graph computation besides d07's connected components).
  * Same contract as Extended5–8: declarative plans, integer carriers
  * until the final double projections, a scale note per entry.
  */
object Extended9 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CHI-SQUARE association screen: the contingency table of customer
    // market segment x order priority with each cell's observed count,
    // expected count under independence, and chi-square contribution —
    // the data-profiling test behind "does segment drive priority mix?"
    // One row PER CELL (the q99 Benford rule): the chi-square scalar
    // would sum doubles in engine-dependent order, but each cell's term
    // is a pure function of four exact integers (obs, row/col/grand
    // totals), so both engines compute bit-identical doubles. Scale
    // shape: orders exchanges once on o_custkey against customer
    // (co-partitioned join), partial-aggregates map-side to
    // |segments| x |priorities| cells; every window below runs over
    // that tiny frame. Total products ride decimals so the math
    // survives row counts past 3e9 (long x long would wrap).
    "q103_chisq_association" -> ((s, d) => {
      val dec = DecimalType(38, 0)
      val cells = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderpriority"))
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"),
          col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n_obs"))
      val wr = Window.partitionBy(col("segment"))
      val wc = Window.partitionBy(col("priority"))
      val wg = Window.partitionBy()
      cells
        .withColumn("row_tot", sum(col("n_obs")).over(wr))
        .withColumn("col_tot", sum(col("n_obs")).over(wc))
        .withColumn("grand", sum(col("n_obs")).over(wg))
        .withColumn("expected",
          (col("row_tot").cast(dec) * col("col_tot").cast(dec))
            .cast("double") / col("grand").cast("double"))
        .select(col("segment"), col("priority"), col("n_obs"),
          col("expected"),
          ((col("n_obs").cast("double") - col("expected"))
            * (col("n_obs").cast("double") - col("expected"))
            / col("expected")).as("chi2_term"))
        .orderBy(col("segment"), col("priority"))
    }),

    // EWMA revenue trend per region: weekly gross revenue smoothed with
    // dyadic exponential weights (alpha = 1/2) over the trailing 8
    // observed weeks — the noise-robust trend line behind q88's raw
    // week-over-week deltas. Weights 128,64,...,1 are exact powers of
    // two and revenue rides integer cents, so the weighted numerator
    // and the present-weight denominator are EXACT longs in both
    // engines; the single division at the end is the only double op
    // (an alpha like 0.3 would need pow() and cross-engine libm — the
    // q99 shared-literal rule is why alpha is dyadic). Weeks are
    // days-since-epoch div 7 (portable int math, no ISO-week
    // disagreement). Scale shape: one exchange on o_custkey for the
    // region join (customer side co-partitioned, nation/region
    // broadcast), partial-agg to |regions| x |weeks| cells; the lag
    // chain runs over that tiny frame, partitioned by region.
    "q104_ewma_revenue" -> ((s, d) => {
      val geo = broadcast(Tables.nation(s, d)
        .join(Tables.region(s, d),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("r_name")))
      val weekly = Tables.orders(s, d)
        .select(col("o_custkey"),
          (datediff(col("o_orderdate"), lit("1970-01-01")) / 7)
            .cast("long").as("wk"),
          graft.Parity.cents2(col("o_totalprice")).as("c"))
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(geo, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("r_name"), col("wk"))
        .agg(sum(col("c")).as("cents"))
      val w = Window.partitionBy(col("r_name")).orderBy(col("wk"))
      def term(j: Int): Column =
        if (j == 0) col("cents") * lit(128L)
        else coalesce(lag(col("cents"), j).over(w), lit(0L)) *
          lit(1L << (7 - j))
      def wgt(j: Int): Column =
        if (j == 0) lit(128L)
        else when(lag(col("cents"), j).over(w).isNotNull,
          lit(1L << (7 - j))).otherwise(lit(0L))
      weekly
        .withColumn("num", (0 to 7).map(term).reduce(_ + _))
        .withColumn("den", (0 to 7).map(wgt).reduce(_ + _))
        .select(col("r_name"), col("wk"),
          (col("cents").cast("double") / lit(100.0)).as("revenue"),
          (col("num").cast("double")
            / (col("den").cast("double") * lit(100.0)))
            .as("ewma_revenue"))
        .orderBy(col("r_name"), col("wk"))
    }),

    // PAGERANK over the part co-purchase graph (two damped iterations,
    // d = 0.85): parts are linked when they ship in the same order, and
    // rank flows along those links — the catalog-centrality score
    // behind "which parts anchor the basket graph" (q70 counts
    // co-occurrence edges; this propagates influence ACROSS them).
    // Ranks ride integer micro-units with truncating division
    // (r div deg, then 150000 + 850*S div 1000), so every iteration is
    // exact long arithmetic — order-independent, engine-independent —
    // and the only doubles are the final projection. Scale shape: the
    // per-order self-join explodes row-locally (baskets are bounded,
    // ~7 items, so O(k^2) stays tiny) with one exchange on l_orderkey;
    // each iteration is the standard Pregel pair — one exchange joining
    // ranks to edge sources, one partial-aggregated exchange summing
    // into destinations — with 8-byte keys and longs on the wire. Hub
    // skew lands on the dst agg, where map-side combine absorbs it;
    // AQE's skew split covers the join side.
    "q105_copurchase_pagerank" -> ((s, d) => {
      // edges feeds deg, both rank iterations, and the final join —
      // and each iteration's ranks feeds the next: without the cuts
      // iteration 2 (and the final join) replays the whole edge build
      // per consumer (the q125/q130 iterative-lineage discipline)
      val edges = Materialize.LocalCheckpoint(
        Extended10.copurchasePairs(s, d)
          .toDF("src", "dst").distinct())
      val deg = Materialize.LocalCheckpoint(
        edges.groupBy(col("src")).agg(count(lit(1)).as("deg")))
      var ranks = deg.select(col("src").as("pk"),
        lit(1000000L).as("r"))
      for (_ <- 1 to 2) {
        // ranks and deg are |V|-sized (one row per part — dimension-
        // sized at any SF, the q107 deg-broadcast precedent), but the
        // LocalCheckpoint cuts erase their size stats, so the planner
        // sort-merge-joined them against the edge list: TWO fact-sized
        // src exchanges per iteration. Pre-divide r/deg on the tiny
        // frame (same per-edge arithmetic — r div deg is a function of
        // src alone), then stream the edges through ONE broadcast hash
        // join: the only per-iteration exchange left is the partial-
        // aggregated dst sum.
        val rod = ranks.join(broadcast(deg), ranks("pk") === deg("src"))
          .select(col("src"), expr("r div deg").as("c"))
        val contrib = edges.join(broadcast(rod), "src")
          .select(col("dst"), col("c"))
        ranks = Materialize.LocalCheckpoint(contrib.groupBy(col("dst"))
          .agg(sum(col("c")).as("s"))
          .select(col("dst").as("pk"),
            expr("150000L + (850 * s) div 1000").as("r")))
      }
      ranks.join(broadcast(deg), ranks("pk") === deg("src"))
        .select(col("pk").as("partkey"), col("deg").as("degree"),
          col("r").as("rank_micro"),
          (col("r").cast("double") / lit(1000000.0)).as("rank"))
        .orderBy(col("partkey"))
    }),

    // ERROR-BURST detection — the N-in-T alerting primitive (3 errors
    // within 5 minutes) over each user's error timeline: a burst point
    // is an error whose 2nd-back predecessor landed <= 300 s earlier.
    // q101 compresses repeats; this DETECTS them — the rule an on-call
    // pager fires on, run in batch for threshold backtesting.
    // Timestamps ride integer epoch-us (the q68/q101 rule), so the
    // window arithmetic is exact in both engines. Scale shape: the
    // error filter pushes to the scan; one lag window partitioned by
    // user_id (high cardinality, timeline-local — the q87 contract);
    // the rollup partial-aggregates to one row per erroring user.
    "q106_error_bursts" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      Tables.events(s, d)
        .filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        .withColumn("burst",
          when(col("us") - lag(col("us"), 2).over(w) <= 300000000L, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_errors"),
          sum(col("burst")).as("n_burst_points"))
        .orderBy(col("user_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q103_chisq_association" ->
      """WITH cells AS (SELECT c_mktsegment AS segment,
             o_orderpriority AS priority, COUNT(1) AS n_obs
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         t AS (SELECT segment, priority, n_obs,
             CAST(SUM(n_obs) OVER (PARTITION BY segment) AS BIGINT)
               AS row_tot,
             CAST(SUM(n_obs) OVER (PARTITION BY priority) AS BIGINT)
               AS col_tot,
             CAST(SUM(n_obs) OVER () AS BIGINT) AS grand
           FROM cells)
         SELECT segment, priority, n_obs,
           CAST(CAST(row_tot AS HUGEINT) * col_tot AS DOUBLE)
             / CAST(grand AS DOUBLE) AS expected,
           (CAST(n_obs AS DOUBLE)
              - CAST(CAST(row_tot AS HUGEINT) * col_tot AS DOUBLE)
                / CAST(grand AS DOUBLE))
           * (CAST(n_obs AS DOUBLE)
              - CAST(CAST(row_tot AS HUGEINT) * col_tot AS DOUBLE)
                / CAST(grand AS DOUBLE))
           / (CAST(CAST(row_tot AS HUGEINT) * col_tot AS DOUBLE)
              / CAST(grand AS DOUBLE)) AS chi2_term
         FROM t ORDER BY segment, priority""",

    "q104_ewma_revenue" -> {
      val num = (1 to 7).map(j =>
        s"COALESCE(lag(cents, $j) OVER w, 0) * ${1L << (7 - j)}")
        .mkString("cents * 128 + ", " + ", "")
      val den = (1 to 7).map(j =>
        s"CASE WHEN lag(cents, $j) OVER w IS NULL THEN 0 ELSE ${1L << (7 - j)} END")
        .mkString("128 + ", " + ", "")
      s"""WITH weekly AS (SELECT r_name,
             CAST(datediff('day', DATE '1970-01-01', o_orderdate) // 7
               AS BIGINT) AS wk,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS cents
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY 1, 2)
         SELECT r_name, wk, CAST(cents AS DOUBLE) / 100.0 AS revenue,
           CAST($num AS DOUBLE)
             / (CAST($den AS DOUBLE) * 100.0) AS ewma_revenue
         FROM weekly
         WINDOW w AS (PARTITION BY r_name ORDER BY wk)
         ORDER BY r_name, wk"""
    },

    "q105_copurchase_pagerank" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
               FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
               WHERE a.l_partkey <> b.l_partkey),
         deg AS (SELECT src, COUNT(1) AS deg FROM e GROUP BY 1),
         r0 AS (SELECT src AS pk, CAST(1000000 AS BIGINT) AS r FROM deg),
         s1 AS (SELECT e.dst AS pk,
                  CAST(SUM(r0.r // deg.deg) AS BIGINT) AS s
                FROM e JOIN r0 ON e.src = r0.pk
                       JOIN deg ON e.src = deg.src
                GROUP BY 1),
         r1 AS (SELECT pk, CAST(150000 + (850 * s) // 1000 AS BIGINT)
                  AS r FROM s1),
         s2 AS (SELECT e.dst AS pk,
                  CAST(SUM(r1.r // deg.deg) AS BIGINT) AS s
                FROM e JOIN r1 ON e.src = r1.pk
                       JOIN deg ON e.src = deg.src
                GROUP BY 1),
         r2 AS (SELECT pk, CAST(150000 + (850 * s) // 1000 AS BIGINT)
                  AS r FROM s2)
         SELECT pk AS partkey, deg AS degree, r AS rank_micro,
           CAST(r AS DOUBLE) / 1000000.0 AS rank
         FROM r2 JOIN deg ON pk = deg.src
         ORDER BY partkey""",

    "q106_error_bursts" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us
           FROM events WHERE event_type = 'error'),
         b AS (SELECT user_id,
             CASE WHEN us - lag(us, 2) OVER w <= 300000000
                  THEN 1 ELSE 0 END AS burst
           FROM e WINDOW w AS (PARTITION BY user_id
             ORDER BY us, event_id))
         SELECT user_id, COUNT(1) AS n_errors,
           CAST(SUM(burst) AS BIGINT) AS n_burst_points
         FROM b GROUP BY user_id ORDER BY user_id"""
  )
}
