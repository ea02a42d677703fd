package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Eighteenth analytics batch (round 11): sequential drift detection
  * and information rate. q202 is Page–Hinkley change detection over
  * the daily revenue series — where q127's CUSUM measures departure
  * from the GLOBAL mean, Page–Hinkley accumulates deviation from a
  * CALIBRATION baseline (the first K observed days) and alarms when
  * the running deficit-to-minimum exceeds λ, i.e. it detects drift
  * away from how the series STARTED. Implemented in the q127/q201
  * exact-integer discipline: with μ0 = S_K/K, δ = μ0/200, the scaled
  * statistic M_t = 200K·P_t − 201·t·S_K is exact DECIMAL(38,0)
  * algebra (DuckDB HUGEINT, the q150 VARCHAR→DOUBLE surface route)
  * and both the alarm predicate (M_t − min M > 2000·S_K ⟺
  * PH > 10·μ0) and the displayed PH value divide exactly once.
  * t50 is the bigram conditional-entropy RATE per language —
  * H(W₂|W₁) = −Σ p(w₁,w₂)·ln p(w₂|w₁), the information-theoretic
  * ceiling any LM on this corpus chases; complements t44 (held-out
  * model cross-entropy, which is this rate PLUS model inefficiency)
  * and t23 (unconditional term entropy). Per-type terms quantize to
  * DECIMAL(18,9) before the order-insensitive sum (the t44 libm-ln
  * rule). The reference delegates all analytics to user code behind
  * its event processor (`/root/reference/README.md:246-293`).
  * q202 has a streaming twin — [[StreamingOps.pageHinkleyFold]], the
  * 16th batch==stream fold: it buffers the 30-day calibration window,
  * then replays it through the identical BigInt recurrence, so the
  * streamed points equal the batch rows bit-for-bit
  * (StatefulStreamSpec).
  */
object Extended18 {

  private val dec = DecimalType(38, 0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PAGE–HINKLEY drift: scale shape — one fact-keyed day rollup
    // (map-side combine), then every window runs over the CALENDAR
    // DAY GRID (~2.4k rows at any data scale); the (S_K, K) baseline
    // is a 1-row broadcast. Alarm fires iff the mean since the
    // calibration window has sagged/run above μ0 + δ by more than
    // λ = 10·μ0 of accumulated deficit.
    "q202_page_hinkley" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .select(datediff(col("o_orderdate").cast("date"),
          to_date(lit("1970-01-01"))).as("day"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy(col("day")).agg(sum(col("cents")).as("x"))
      val wSeq = Window.orderBy(col("day"))
      val wPre = wSeq.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val ord = daily
        .withColumn("t", row_number().over(wSeq))
        .withColumn("p", sum(col("x").cast(dec)).over(wPre))
      val base = ord.filter(col("t") <= 30)
        .agg(sum(col("x").cast(dec)).as("sk"),
          count(lit(1)).cast(dec).as("k"))
      ord.crossJoin(broadcast(base))
        .withColumn("mt",
          lit(200).cast(dec) * col("k") * col("p") -
            lit(201).cast(dec) * col("t").cast(dec) * col("sk"))
        .withColumn("e", col("mt") - min(col("mt")).over(wPre))
        .select(
          date_add(to_date(lit("1970-01-01")), col("day"))
            .cast("string").as("dt"),
          col("x").as("revenue_cents"),
          (col("e").cast("double") /
            (lit(200.0) * col("k").cast("double"))).as("ph_cents"),
          (col("e") > lit(2000).cast(dec) * col("sk")).as("is_alarm"))
        .orderBy(col("dt"))
    }),

    // BIGRAM ENTROPY RATE per language: H(W₂|W₁) in bits/token from
    // the corpus's own bigram statistics — H = (1/N)·Σ_types
    // c₂·ln(c₁/c₂), surfaced in bits via one division by ln 2. The
    // t44 quantization contract: each type's c₂·ln(c₁/c₂) term is
    // DECIMAL(18,9)-quantized BEFORE the sum (ln is libm, 1-ulp
    // cross-engine; the division c₁/c₂ itself is IEEE-exact). Scale
    // shape: gram explode is in-row; c₂ and c₁ are (lang, gram)
    // counts with map-side combine; the final rollup is |langs| rows.
    "t50_entropy_rate" -> ((s, d) => {
      val bg = Tables.documents(s, d)
        .select(col("lang"),
          expr("filter(split(trim(text), ' '), x -> x <> '')").as("ws"))
        .select(col("lang"), explode(expr(
          "CASE WHEN size(ws) >= 2 THEN transform(sequence(0, size(ws) - 2), " +
            "i -> struct(ws[i] AS w1, ws[i+1] AS w2)) ELSE " +
            "array() END")).as("g"))
        .select(col("lang"), col("g.w1").as("w1"), col("g.w2").as("w2"))
      val c2 = bg.groupBy(col("lang"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("c2"))
      val c1 = bg.groupBy(col("lang"), col("w1"))
        .agg(count(lit(1)).as("c1"))
      c2.join(c1, Seq("lang", "w1"))
        .withColumn("term",
          (col("c2").cast("double") *
            log(col("c1").cast("double") / col("c2").cast("double")))
            .cast(DecimalType(18, 9)))
        .groupBy(col("lang"))
        .agg(sum(col("c2")).as("n_bigrams"),
          countDistinct(col("w1")).as("n_contexts"),
          count(lit(1)).as("n_types"),
          sum(col("term")).cast("double").as("nats_total"))
        .withColumn("entropy_rate_bits",
          (col("nats_total") / col("n_bigrams").cast("double")) /
            lit(0.6931471805599453))
        .select(col("lang"), col("n_bigrams"), col("n_contexts"),
          col("n_types"), col("nats_total"), col("entropy_rate_bits"))
        .orderBy(col("lang"))
    }))

  def oracleSql: Map[String, String] = Map(

    "q202_page_hinkley" ->
      """WITH daily AS (SELECT datediff('day', DATE '1970-01-01',
             CAST(o_orderdate AS DATE)) AS day,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS x
           FROM orders GROUP BY 1),
         ord AS (SELECT day, x,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS HUGEINT) AS t,
             CAST(SUM(CAST(x AS HUGEINT)) OVER (ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS p
           FROM daily),
         base AS (SELECT CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sk,
             CAST(COUNT(1) AS HUGEINT) AS k
           FROM ord WHERE t <= 30),
         m AS (SELECT day, x, t, k, sk,
             200 * k * p - 201 * t * sk AS mt
           FROM ord CROSS JOIN base),
         ph AS (SELECT day, x, k, sk,
             mt - CAST(MIN(mt) OVER (ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS e
           FROM m)
         SELECT CAST(DATE '1970-01-01' + CAST(day AS INT) AS VARCHAR)
             AS dt,
           x AS revenue_cents,
           CAST(CAST(e AS VARCHAR) AS DOUBLE) /
             (200.0 * CAST(CAST(k AS VARCHAR) AS DOUBLE)) AS ph_cents,
           e > 2000 * sk AS is_alarm
         FROM ph ORDER BY dt""",

    "t50_entropy_rate" ->
      """WITH w AS (SELECT lang,
           list_filter(string_split(TRIM(text), ' '), x -> x <> '') AS ws
           FROM documents),
         bg AS (SELECT lang, ws[i] AS w1, ws[i + 1] AS w2
           FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
           WHERE len(ws) >= 2),
         c2 AS (SELECT lang, w1, w2, CAST(COUNT(1) AS BIGINT) AS c2
           FROM bg GROUP BY 1, 2, 3),
         c1 AS (SELECT lang, w1, CAST(COUNT(1) AS BIGINT) AS c1
           FROM bg GROUP BY 1, 2),
         t AS (SELECT c2.lang, c2.c2,
             CAST(CAST(c2.c2 AS DOUBLE) *
               ln(CAST(c1.c1 AS DOUBLE) / CAST(c2.c2 AS DOUBLE))
               AS DECIMAL(18, 9)) AS term
           FROM c2 JOIN c1 ON c2.lang = c1.lang AND c2.w1 = c1.w1),
         agg AS (SELECT lang, CAST(SUM(c2) AS BIGINT) AS n_bigrams,
             CAST(COUNT(1) AS BIGINT) AS n_types,
             CAST(SUM(term) AS DOUBLE) AS nats_total
           FROM t GROUP BY 1),
         ctx AS (SELECT lang, CAST(COUNT(1) AS BIGINT) AS n_contexts
           FROM c1 GROUP BY 1)
         SELECT agg.lang AS lang, n_bigrams, n_contexts, n_types,
           nats_total,
           (nats_total / CAST(n_bigrams AS DOUBLE)) / 0.6931471805599453
             AS entropy_rate_bits
         FROM agg JOIN ctx ON agg.lang = ctx.lang
         ORDER BY 1""")
}
