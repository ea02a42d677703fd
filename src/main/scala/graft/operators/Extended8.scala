package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Eighth analytics batch: customer-lifecycle and market-structure
  * tables — the cohort LTV curve (the revenue companion to q65's
  * retention counts), a Benford first-digit audit, and revenue
  * concentration (HHI). Same contract as Extended5–7: declarative
  * plans, integer carriers until the final double projections, and a
  * scale note per entry for the 1000-executor / 100 TB shape.
  */
object Extended8 {

  // Benford expected first-digit shares log10(1 + 1/d), d = 1..9,
  // written as exact double literals so both engines parse the SAME
  // doubles instead of each calling their own libm log10 (the t16/t21
  // log-free cross-engine contract).
  private val Benford = Seq(
    0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // COHORT LTV curve: customers grouped by first-order month, and for
    // each month offset the cohort's revenue plus CUMULATIVE revenue
    // per cohort customer — the lifetime-value ramp that prices
    // acquisition spend (q65 tracks who comes back; this tracks what
    // they are worth). Months ride a single integer (year*12+month-1)
    // so cohort/offset arithmetic is portable int math; revenue rides
    // integer cents until the final projections. Scale shape: the
    // order frame partial-aggregates map-side and exchanges once on
    // o_custkey for the first-order join (co-partitioned both sides);
    // the rollup collapses to |cohorts|x|offsets| cells, so the
    // cumulative window and cohort-size broadcast join run over a
    // frame that stays tiny no matter how large orders grows.
    "q98_cohort_ltv" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val om = Tables.orders(s, d).select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("ym"),
        round(col("o_totalprice") * lit(100)).cast("long").as("cents"))
      val first = om.groupBy(col("o_custkey"))
        .agg(min(col("ym")).as("cohort_ym"))
      val cells = om.join(first, "o_custkey")
        .withColumn("months_since",
          (col("ym") - col("cohort_ym")).cast("int"))
        .groupBy(col("cohort_ym"), col("months_since"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("rev_c"))
      val sizes = first.groupBy(col("cohort_ym"))
        .agg(count(lit(1)).as("cohort_size"))
      val wc = Window.partitionBy(col("cohort_ym"))
        .orderBy(col("months_since"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells.join(broadcast(sizes), "cohort_ym")
        .withColumn("cum_c", sum(col("rev_c")).over(wc))
        .select(
          format_string("%04d-%02d",
            expr("cohort_ym div 12"), col("cohort_ym") % 12 + 1)
            .as("cohort_month"),
          col("months_since"), col("cohort_size"), col("n_orders"),
          (col("rev_c").cast("double") / lit(100.0)).as("revenue"),
          (col("cum_c").cast("double") / lit(100.0)
            / col("cohort_size").cast("double")).as("cum_ltv"))
        .orderBy(col("cohort_month"), col("months_since"))
    }),

    // BENFORD first-digit audit over order totals: observed share of
    // each leading digit vs the Benford expectation — the forensic
    // data-quality screen for fabricated or truncated monetary data.
    // Expected shares are shared double literals (header note), and
    // the output is one row per digit with its own deviation, so no
    // cross-row double accumulation ever happens in either engine (a
    // chi-square scalar would sum doubles in engine-dependent order).
    // Scale shape: the digit projection is row-local string math on
    // integer cents; the aggregate partial-combines map-side to 9
    // rows; the total rides a tiny window over those 9.
    "q99_benford_profile" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val exp9 = array(Benford.map(lit): _*)
      val digits = Tables.orders(s, d)
        .select(substring(
          round(col("o_totalprice") * lit(100)).cast("long").cast("string"),
          1, 1).cast("int").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n_orders"))
      val wt = Window.partitionBy()
      digits
        .withColumn("obs_share", col("n_orders").cast("double")
          / sum(col("n_orders")).over(wt).cast("double"))
        .withColumn("exp_share", element_at(exp9, col("digit")))
        .select(col("digit"), col("n_orders"), col("obs_share"),
          col("exp_share"),
          (col("obs_share") - col("exp_share")).as("deviation"))
        .orderBy(col("digit"))
    }),

    // REVENUE CONCENTRATION per region: Herfindahl–Hirschman index over
    // supplier revenue shares, plus the top-supplier share — the
    // market-structure table behind "is this supply region dominated
    // by one vendor". HHI = sum(rev_i^2) / (sum rev_i)^2 computed on
    // exact integer cents (decimal(18,0) squared fits decimal(37,0);
    // DuckDB mirrors in HUGEINT), so both engines round the SAME exact
    // integers to double at the final projection — no order-dependent
    // float accumulation. Scale shape: supplier revenue is one
    // map-side-combined exchange on l_suppkey (8-byte key + long);
    // supplier→nation→region is a key join plus two dim broadcasts;
    // the final agg is |regions| rows.
    "q100_hhi_concentration" -> ((s, d) => {
      val dec = DecimalType(18, 0)
      val rev = Tables.lineitem(s, d)
        .select(col("l_suppkey"),
          graft.Parity.cents2(col("l_extendedprice")).as("c"))
        .groupBy(col("l_suppkey")).agg(sum(col("c")).as("rev_cents"))
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))
      val geo = broadcast(Tables.nation(s, d)
        .join(Tables.region(s, d),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("r_name")))
      rev.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(geo, col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("rev_cents")).as("tot_cents"),
          sum(col("rev_cents").cast(dec) * col("rev_cents").cast(dec))
            .as("sumsq"),
          max(col("rev_cents")).as("max_cents"))
        .select(col("r_name"), col("n_suppliers"),
          (col("tot_cents").cast("double") / lit(100.0)).as("revenue"),
          (col("sumsq").cast("double")
            / (col("tot_cents").cast("double")
              * col("tot_cents").cast("double"))).as("hhi"),
          (col("max_cents").cast("double")
            / col("tot_cents").cast("double")).as("top_share"))
        .orderBy(col("r_name"))
    }),

    // DISCOUNT-BAND effectiveness: lineitems bucketed by discount
    // percent, with volume, gross revenue, the discount's cost and its
    // share of gross per band — the promotion-pricing table behind
    // "does a deeper discount actually move volume" (discount appears
    // everywhere else only as a revenue multiplier; here it is the
    // DIMENSION). Carriers are integer cents (the q68 rule); the
    // per-row discount cost rounds the same IEEE product in both
    // engines (round(px·disc·100), the Extended6 precedent). Scale
    // shape: one map-side-combined exchange to ~11 bands; every
    // division happens on the tiny final frame.
    "q102_discount_effectiveness" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(
          round(col("l_discount") * lit(100)).cast("int").as("disc_pct"),
          graft.Parity.cents2(col("l_quantity")).as("qc"),
          graft.Parity.cents2(col("l_extendedprice")).as("gc"),
          round(col("l_extendedprice") * col("l_discount") * lit(100))
            .cast("long").as("dc"))
        .groupBy(col("disc_pct"))
        .agg(count(lit(1)).as("n_lines"), sum(col("qc")).as("sq"),
          sum(col("gc")).as("sg"), sum(col("dc")).as("sd"))
        .select(col("disc_pct"), col("n_lines"),
          (col("sq").cast("double") / lit(100.0)
            / col("n_lines").cast("double")).as("avg_qty"),
          (col("sg").cast("double") / lit(100.0)).as("gross_revenue"),
          (col("sd").cast("double") / lit(100.0)).as("discount_cost"),
          (col("sd").cast("double") / col("sg").cast("double"))
            .as("cost_share"))
        .orderBy(col("disc_pct"))
    }),

    // DEBOUNCE / run-length compression of event streams: a row is
    // redundant when it repeats the previous event's type within 60 s
    // on the same user's timeline — the sensor/telemetry compaction
    // every high-frequency ingest runs before storage (q62 compacts by
    // key to latest; this compacts along time). Reports per-user raw
    // vs kept counts and the compression rate. Scale shape: one lag
    // window partitioned by user_id (high cardinality, timeline-local
    // — the q87 contract), timestamps carried as integer epoch-µs
    // (unix_micros == DuckDB epoch_us, the q68 rule); the rollup
    // partial-aggregates to one row per user.
    "q101_debounce_compress" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("kept", when(col("prev_type").isNull
          || col("prev_type") =!= col("event_type")
          || col("us") - col("prev_us") > 60000000L, 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("kept")).as("n_kept"))
        .withColumn("compression_rate",
          lit(1.0) - col("n_kept").cast("double")
            / col("n_events").cast("double"))
        .select(col("user_id"), col("n_events"), col("n_kept"),
          col("compression_rate"))
        .orderBy(col("user_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q98_cohort_ltv" ->
      """WITH om AS (SELECT o_custkey,
             CAST(date_part('year', o_orderdate) * 12
               + date_part('month', o_orderdate) - 1 AS BIGINT) AS ym,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
         f AS (SELECT o_custkey, MIN(ym) AS cohort_ym FROM om GROUP BY 1),
         cells AS (SELECT cohort_ym,
                 CAST(ym - cohort_ym AS INT) AS months_since,
                 COUNT(1) AS n_orders,
                 CAST(SUM(cents) AS BIGINT) AS rev_c
               FROM om JOIN f USING (o_custkey) GROUP BY 1, 2),
         sz AS (SELECT cohort_ym, COUNT(1) AS cohort_size FROM f
                GROUP BY 1),
         cum AS (SELECT cohort_ym, months_since, n_orders, rev_c,
                   CAST(SUM(rev_c) OVER (PARTITION BY cohort_ym
                     ORDER BY months_since
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_c
                 FROM cells)
         SELECT printf('%04d-%02d', CAST(cohort_ym // 12 AS INT),
             CAST(cohort_ym % 12 + 1 AS INT)) AS cohort_month,
           months_since, cohort_size, n_orders,
           CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
           CAST(cum_c AS DOUBLE) / 100.0 / CAST(cohort_size AS DOUBLE)
             AS cum_ltv
         FROM cum JOIN sz USING (cohort_ym)
         ORDER BY cohort_month, months_since""",

    "q99_benford_profile" -> {
      val exp9 = Benford.mkString("[", ", ", "]")
      s"""WITH dg AS (SELECT CAST(substring(
             CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
             1, 1) AS INT) AS digit
           FROM orders),
         c AS (SELECT digit, COUNT(1) AS n_orders FROM dg GROUP BY 1)
         SELECT digit, n_orders,
           CAST(n_orders AS DOUBLE)
             / CAST(CAST(SUM(n_orders) OVER () AS BIGINT) AS DOUBLE)
             AS obs_share,
           ($exp9)[digit] AS exp_share,
           CAST(n_orders AS DOUBLE)
             / CAST(CAST(SUM(n_orders) OVER () AS BIGINT) AS DOUBLE)
             - ($exp9)[digit] AS deviation
         FROM c ORDER BY digit"""
    },

    "q100_hhi_concentration" ->
      """WITH rev AS (SELECT l_suppkey,
             SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
               AS rev_cents
           FROM lineitem GROUP BY 1)
         SELECT r_name, COUNT(1) AS n_suppliers,
           CAST(CAST(SUM(rev_cents) AS BIGINT) AS DOUBLE) / 100.0
             AS revenue,
           CAST(SUM(CAST(rev_cents AS HUGEINT) * rev_cents) AS DOUBLE)
             / (CAST(CAST(SUM(rev_cents) AS BIGINT) AS DOUBLE)
               * CAST(CAST(SUM(rev_cents) AS BIGINT) AS DOUBLE)) AS hhi,
           CAST(MAX(rev_cents) AS DOUBLE)
             / CAST(CAST(SUM(rev_cents) AS BIGINT) AS DOUBLE) AS top_share
         FROM rev
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",

    "q102_discount_effectiveness" ->
      """WITH b AS (SELECT
             CAST(round(l_discount * 100) AS INT) AS disc_pct,
             CAST(round(l_quantity * 100) AS BIGINT) AS qc,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS gc,
             CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)
               AS dc
           FROM lineitem)
         SELECT disc_pct, COUNT(1) AS n_lines,
           CAST(CAST(SUM(qc) AS BIGINT) AS DOUBLE) / 100.0
             / CAST(COUNT(1) AS DOUBLE) AS avg_qty,
           CAST(CAST(SUM(gc) AS BIGINT) AS DOUBLE) / 100.0
             AS gross_revenue,
           CAST(CAST(SUM(dc) AS BIGINT) AS DOUBLE) / 100.0
             AS discount_cost,
           CAST(CAST(SUM(dc) AS BIGINT) AS DOUBLE)
             / CAST(CAST(SUM(gc) AS BIGINT) AS DOUBLE) AS cost_share
         FROM b GROUP BY disc_pct ORDER BY disc_pct""",

    "q101_debounce_compress" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us,
             lag(event_type) OVER w AS prev_type,
             lag(epoch_us(ts)) OVER w AS prev_us
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         k AS (SELECT user_id,
             CASE WHEN prev_type IS NULL OR prev_type <> event_type
                    OR us - prev_us > 60000000 THEN 1 ELSE 0 END AS kept
           FROM e)
         SELECT user_id, COUNT(1) AS n_events,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           1.0 - CAST(CAST(SUM(kept) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(1) AS DOUBLE) AS compression_rate
         FROM k GROUP BY user_id ORDER BY user_id"""
  )
}
