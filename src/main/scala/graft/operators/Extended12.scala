package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Parity, Tables}

/** Twelfth analytics batch: k-sample hypothesis tests — the
  * generalization of q134's two-sample Mann–Whitney to the k-group
  * question "do these populations share a location at all?", asked both
  * nonparametrically (Kruskal–Wallis H on exact 2× midranks) and
  * parametrically (one-way ANOVA F on exact integer moments). Both run
  * on the same contrast (per-order revenue across order-size buckets
  * narrow ≤2 / mid 3–5 / wide ≥6 items — a split that demonstrably
  * separates on this corpus, per the q108 attainability rule), so the
  * pair doubles as a rank-vs-moment agreement check a practitioner
  * would actually run. Same contract as Extended5–11: declarative
  * plans, exact integer carriers until the final double projections
  * (identical operation sequence on both engines, ties kept exact via
  * the 2·below + t + 1 midrank carrier, grouped/windowed BIGINT sums
  * CAST in the oracle against DuckDB's HUGEINT widening), a scale note
  * per entry. The reference delegates all of this to user code behind
  * its event processor (`/root/reference/README.md:246-293`).
  */
object Extended12 {

  /** Per-order whole-dollar revenue tagged with its order-size bucket —
    * the shared input of q139/q140. The only fact-table exchange either
    * test needs: one keyed rollup of lineitem; everything downstream
    * runs on the value grid (q134's stance).
    */
  private def orderSizeBuckets(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(Parity.cents2(col("l_extendedprice"))).as("cents"))
      .select(expr("cents div 100").as("value"),
        when(col("n_items") <= 2, lit("narrow"))
          .when(col("n_items") <= 5, lit("mid"))
          .otherwise(lit("wide")).as("grp"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // KRUSKAL-WALLIS H — the k-sample rank test: one statistic for
    // "does per-order revenue differ across order-size buckets?",
    // where q134 could only compare two of them. Ranks are never
    // materialized per row: group by distinct whole-dollar revenue →
    // (ca, cb, cc) bucket counts, one cumulative window over the
    // pooled DISTINCT-value grid, and the 2·below + t + 1 carrier
    // keeps tie-aware midranks exact integers. Rank sums per bucket
    // (as 2× sums), the tie cubic, and N assemble from exact longs in
    // ONE partial-aggregating pass over the grid; H = 3·Σ(R2_g²/n_g)
    // / (N(N+1)) − 3(N+1) (the 12/4 folded because the carrier is 2R)
    // and the tie correction 1 − Σ(t³−t)/(N³−N) are the only double
    // arithmetic, written as the identical operation sequence in both
    // engines — no sqrt, so the statistic is division-exact
    // cross-engine. Rejection at the χ²(0.95, df=2) critical value.
    // Scale shape: the only fact exchange is the per-order rollup; the
    // grid is bounded by the price range, not the order count. Exact-
    // carrier range: Σ c·r2 ≤ 2N² holds in longs to N ≈ 2e9 orders.
    "q139_kruskal_wallis" -> ((s, d) => {
      val ev = orderSizeBuckets(s, d).groupBy(col("value"))
        .agg(sum(when(col("grp") === "narrow", 1L).otherwise(0L)).as("ca"),
          sum(when(col("grp") === "mid", 1L).otherwise(0L)).as("cb"),
          sum(when(col("grp") === "wide", 1L).otherwise(0L)).as("cc"))
        .withColumn("t", col("ca") + col("cb") + col("cc"))
      val wBelow = Window.orderBy(col("value"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val grid = ev
        .withColumn("below", coalesce(sum(col("t")).over(wBelow), lit(0L)))
        .withColumn("r2", lit(2L) * col("below") + col("t") + 1L)
      grid.agg(
          sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
          sum(col("cc")).as("nc"),
          sum(col("ca") * col("r2")).as("ra2"),
          sum(col("cb") * col("r2")).as("rb2"),
          sum(col("cc") * col("r2")).as("rc2"),
          sum(col("t") * col("t") * col("t") - col("t")).as("tie3"))
        .withColumn("n", col("na") + col("nb") + col("nc"))
        .withColumn("nd", col("n").cast("double"))
        .withColumn("hsum",
          col("ra2").cast("double") * col("ra2").cast("double") /
            col("na").cast("double") +
          col("rb2").cast("double") * col("rb2").cast("double") /
            col("nb").cast("double") +
          col("rc2").cast("double") * col("rc2").cast("double") /
            col("nc").cast("double"))
        .withColumn("h_raw",
          lit(3.0) * col("hsum") / col("nd") / (col("nd") + lit(1.0)) -
            lit(3.0) * (col("nd") + lit(1.0)))
        .withColumn("tie_corr",
          lit(1.0) - col("tie3").cast("double") /
            (col("nd") * col("nd") * col("nd") - col("nd")))
        .withColumn("h_stat", col("h_raw") / col("tie_corr"))
        .select(col("na"), col("nb"), col("nc"), col("n"),
          col("h_raw"), col("tie_corr"), col("h_stat"),
          (col("h_stat") > 5.991464547107979).as("reject_95"))
    }),

    // ONE-WAY ANOVA F — the parametric twin of q139 on the same
    // order-size contrast: between/within sums of squares from exact
    // whole-dollar long moments (n_g, Σx, Σx² per bucket, one
    // partial-aggregating pass; Σx² ≤ N·max(x)² holds in longs to
    // N ≈ 3e7 orders at this price range — beyond that, switch the
    // carrier to DECIMAL(38,0), same plan shape). SSB = Σ(Sx_g²/n_g)
    // − Sx²/N and SSW = Σx² − Σ(Sx_g²/n_g) assemble in doubles with a
    // fixed 3-term sequence identical in both engines; F =
    // (SSB/df1)/(SSW/df2), df1 = 2, df2 = N − 3. No sqrt — the F
    // ratio is division-exact cross-engine. Rejection at the
    // F(0.95; 2, ∞) critical value (df2 is ~1e4 even at sf0.001, where
    // the ∞ quantile is conservative to <0.3%). Reading q139 and q140
    // together is the practitioner's robustness check: when the
    // rank test and the moment test agree this strongly, the location
    // shift is real, not a tail artifact.
    "q140_anova_oneway" -> ((s, d) => {
      val g = orderSizeBuckets(s, d).groupBy(col("grp"))
        .agg(count(lit(1)).as("n_g"), sum(col("value")).as("sx"),
          sum(col("value") * col("value")).as("sxx"))
      g.agg(
          sum(col("n_g")).as("n"),
          sum(col("sx")).as("sx_all"),
          sum(col("sxx")).as("sxx_all"),
          sum(when(col("grp") === "narrow", col("n_g"))).as("na"),
          sum(when(col("grp") === "mid", col("n_g"))).as("nb"),
          sum(when(col("grp") === "wide", col("n_g"))).as("nc"),
          sum(when(col("grp") === "narrow", col("sx"))).as("sa"),
          sum(when(col("grp") === "mid", col("sx"))).as("sb"),
          sum(when(col("grp") === "wide", col("sx"))).as("sc"))
        .withColumn("nd", col("n").cast("double"))
        .withColumn("gsum",
          col("sa").cast("double") * col("sa").cast("double") /
            col("na").cast("double") +
          col("sb").cast("double") * col("sb").cast("double") /
            col("nb").cast("double") +
          col("sc").cast("double") * col("sc").cast("double") /
            col("nc").cast("double"))
        .withColumn("ssb",
          col("gsum") - col("sx_all").cast("double") *
            col("sx_all").cast("double") / col("nd"))
        .withColumn("ssw", col("sxx_all").cast("double") - col("gsum"))
        .withColumn("f_stat",
          col("ssb") / lit(2.0) /
            (col("ssw") / (col("nd") - lit(3.0))))
        .select(col("na"), col("nb"), col("nc"), col("n"),
          col("ssb"), col("ssw"), col("f_stat"),
          (col("f_stat") > 2.9957).as("reject_95"))
    }))

  def oracleSql: Map[String, String] = Map(

    "q139_kruskal_wallis" ->
      """WITH per AS (SELECT l_orderkey, COUNT(1) AS n_items,
        |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |  s AS (SELECT cents // 100 AS value,
        |    CASE WHEN n_items <= 2 THEN 'narrow'
        |         WHEN n_items <= 5 THEN 'mid'
        |         ELSE 'wide' END AS grp
        |    FROM per),
        |  ev AS (SELECT value,
        |    CAST(SUM(CASE WHEN grp = 'narrow' THEN 1 ELSE 0
        |      END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN grp = 'mid' THEN 1 ELSE 0
        |      END) AS BIGINT) AS cb,
        |    CAST(SUM(CASE WHEN grp = 'wide' THEN 1 ELSE 0
        |      END) AS BIGINT) AS cc
        |  FROM s GROUP BY 1),
        |  g AS (SELECT value, ca, cb, cc, ca + cb + cc AS t FROM ev),
        |  grid AS (SELECT ca, cb, cc, t,
        |    COALESCE(CAST(SUM(t) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS below
        |  FROM g),
        |  r AS (SELECT ca, cb, cc, t, 2 * below + t + 1 AS r2 FROM grid),
        |  agg AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
        |    CAST(SUM(cb) AS BIGINT) AS nb,
        |    CAST(SUM(cc) AS BIGINT) AS nc,
        |    CAST(SUM(ca * r2) AS BIGINT) AS ra2,
        |    CAST(SUM(cb * r2) AS BIGINT) AS rb2,
        |    CAST(SUM(cc * r2) AS BIGINT) AS rc2,
        |    CAST(SUM(t * t * t - t) AS BIGINT) AS tie3 FROM r),
        |  st AS (SELECT na, nb, nc, na + nb + nc AS n,
        |    CAST(na + nb + nc AS DOUBLE) AS nd,
        |    CAST(ra2 AS DOUBLE) * CAST(ra2 AS DOUBLE) / CAST(na AS DOUBLE) +
        |    CAST(rb2 AS DOUBLE) * CAST(rb2 AS DOUBLE) / CAST(nb AS DOUBLE) +
        |    CAST(rc2 AS DOUBLE) * CAST(rc2 AS DOUBLE) / CAST(nc AS DOUBLE)
        |      AS hsum,
        |    tie3
        |  FROM agg),
        |  h AS (SELECT na, nb, nc, n,
        |    3.0 * hsum / nd / (nd + 1.0) - 3.0 * (nd + 1.0) AS h_raw,
        |    1.0 - CAST(tie3 AS DOUBLE) / (nd * nd * nd - nd) AS tie_corr
        |  FROM st)
        |SELECT na, nb, nc, n, h_raw, tie_corr,
        |  h_raw / tie_corr AS h_stat,
        |  h_raw / tie_corr > 5.991464547107979 AS reject_95
        |FROM h""".stripMargin,

    "q140_anova_oneway" ->
      """WITH per AS (SELECT l_orderkey, COUNT(1) AS n_items,
        |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |  s AS (SELECT cents // 100 AS value,
        |    CASE WHEN n_items <= 2 THEN 'narrow'
        |         WHEN n_items <= 5 THEN 'mid'
        |         ELSE 'wide' END AS grp
        |    FROM per),
        |  g AS (SELECT grp, CAST(COUNT(1) AS BIGINT) AS n_g,
        |    CAST(SUM(value) AS BIGINT) AS sx,
        |    CAST(SUM(value * value) AS BIGINT) AS sxx
        |  FROM s GROUP BY 1),
        |  agg AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n,
        |    CAST(SUM(sx) AS BIGINT) AS sx_all,
        |    CAST(SUM(sxx) AS BIGINT) AS sxx_all,
        |    CAST(SUM(CASE WHEN grp = 'narrow' THEN n_g END) AS BIGINT) AS na,
        |    CAST(SUM(CASE WHEN grp = 'mid' THEN n_g END) AS BIGINT) AS nb,
        |    CAST(SUM(CASE WHEN grp = 'wide' THEN n_g END) AS BIGINT) AS nc,
        |    CAST(SUM(CASE WHEN grp = 'narrow' THEN sx END) AS BIGINT) AS sa,
        |    CAST(SUM(CASE WHEN grp = 'mid' THEN sx END) AS BIGINT) AS sb,
        |    CAST(SUM(CASE WHEN grp = 'wide' THEN sx END) AS BIGINT) AS sc
        |  FROM g),
        |  st AS (SELECT na, nb, nc, n, CAST(n AS DOUBLE) AS nd,
        |    CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) +
        |    CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) +
        |    CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE)
        |      AS gsum,
        |    sx_all, sxx_all
        |  FROM agg),
        |  ss AS (SELECT na, nb, nc, n, nd,
        |    gsum - CAST(sx_all AS DOUBLE) * CAST(sx_all AS DOUBLE) / nd
        |      AS ssb,
        |    CAST(sxx_all AS DOUBLE) - gsum AS ssw
        |  FROM st)
        |SELECT na, nb, nc, n, ssb, ssw,
        |  ssb / 2.0 / (ssw / (nd - 3.0)) AS f_stat,
        |  ssb / 2.0 / (ssw / (nd - 3.0)) > 2.9957 AS reject_95
        |FROM ss""".stripMargin)
}
