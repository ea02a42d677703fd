package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fifth analytics batch: market-basket association rules, robust
  * (median/MAD) anomaly detection, equi-depth decile gain analysis, and
  * last-touch channel attribution.
  *
  * Like the rest of the analytical surface these go beyond the
  * reference's ingest scope (reactive-kinesis delegates all analysis to
  * user code downstream of `source(...)` — `main/stream`); they are
  * the downstream queries such a user runs, re-expressed Spark-first.
  * Every query here is a declarative plan (Catalyst handles pushdown /
  * partial aggregation); the scale notes on each entry say why the
  * shape survives a 1000-executor, 100 TB corpus.
  */
object Extended5 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MARKET-BASKET association rules (support / confidence / lift)
    // over order baskets, with a-priori pruning: items below the
    // support floor are removed BEFORE pairing, so the quadratic
    // blow-up is bounded by (max basket size)^2 x surviving items —
    // the standard frequent-itemset shape. Scale: the basket frame
    // shuffles once on l_orderkey (the self-join key); per-order pair
    // fan-out is C(basket,2) with TPC-H baskets of ~4-7 lines, so the
    // exchange grows linearly with orders. The per-item count frame is
    // |parts|-sized — broadcast to both the pruning semi-join and the
    // rule stats join, so the big side never reshuffles on partkey.
    "q84_market_basket" -> ((s, d) => {
      val minItem = 20L // item support floor (a-priori prune)
      val minPair = 3L  // rule support floor
      // baskets built IN-ROW (one l_orderkey exchange, the q107/q130
      // round-12 edge-build shape) and cut once: the frame feeds the
      // item counts, the basket total, and the pair fan-out — the old
      // distinct + self-join recomputed the (order, part) exchange
      // three times and shuffled both sides of the pair join
      val baskets = Materialize.LocalCheckpoint(Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps")))
      val cnt = baskets.select(explode(col("ps")).as("l_partkey"))
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      val freq = Materialize.LocalCheckpoint(cnt.filter(col("c") >= minItem))
      // basket total as a 1-row broadcast (scalar rides the plan — no
      // separate driver-side count job)
      val nb = baskets.agg(count(lit(1)).as("n_baskets"))
      // pair fan-out over the FULL basket (no in-row a-priori prune:
      // at this support floor most parts are frequent, and a per-row
      // array_intersect against the ~|parts| frequent set costs
      // O(basket × |freq|) — measured 75 s at sf0.1; the ca/cb inner
      // joins below filter pairs to frequent×frequent anyway, and
      // pair_cnt is a global count the prune never changed)
      val pairs = baskets
        .select(explode(expr(
          "CASE WHEN size(ps) >= 2 THEN flatten(transform(" +
            "sequence(1, size(ps) - 1), i -> transform(" +
            "slice(ps, i + 1, size(ps) - i), " +
            "y -> struct(element_at(ps, i) AS part_a, y AS part_b)))) " +
            "ELSE CAST(array() AS ARRAY<STRUCT<part_a: BIGINT, " +
            "part_b: BIGINT>>) END")).as("e"))
        .select(col("e.part_a").as("part_a"), col("e.part_b").as("part_b"))
        .groupBy(col("part_a"), col("part_b"))
        .agg(count(lit(1)).as("pair_cnt"))
        .filter(col("pair_cnt") >= minPair)
      val ca = broadcast(freq.select(col("l_partkey").as("part_a"),
        col("c").as("cnt_a")))
      val cb = broadcast(freq.select(col("l_partkey").as("part_b"),
        col("c").as("cnt_b")))
      pairs.join(ca, "part_a").join(cb, "part_b")
        .crossJoin(broadcast(nb))
        .select(col("part_a"), col("part_b"), col("pair_cnt"),
          col("cnt_a"), col("cnt_b"),
          (col("pair_cnt").cast("double") / col("n_baskets").cast("double"))
            .as("support"),
          (col("pair_cnt").cast("double") / col("cnt_a").cast("double"))
            .as("conf_a_b"),
          (col("pair_cnt").cast("double") / col("cnt_b").cast("double"))
            .as("conf_b_a"),
          (col("pair_cnt").cast("double") * col("n_baskets").cast("double")
            / (col("cnt_a").cast("double") * col("cnt_b").cast("double")))
            .as("lift"))
        .orderBy(col("part_a"), col("part_b"))
    }),

    // ROBUST anomaly detection: per event type, exact median and MAD
    // (median absolute deviation), then count values outside the
    // standard 3-sigma-equivalent fence 3 x 1.4826 x MAD. Median/MAD
    // resist the very outliers they hunt (mean/stddev do not), which
    // is why monitoring pipelines prefer them. Shape: two grouped
    // exact-percentile aggregates over a 5-group key plus one
    // broadcast join of the 5-row median frame back onto events — the
    // only full-data exchange is the groupBy(event_type) itself, and
    // partial aggregation collapses it map-side. percentile() here is
    // exact (the group count is bounded per type at any scale by
    // the type cardinality, not corpus size... the per-group sort is
    // the cost; for unbounded groups swap in the q52 KMV quantile
    // sketch — same query shape, mergeable state).
    "q85_robust_anomaly" -> ((s, d) => {
      val e = Tables.events(s, d).select(col("event_type"), col("value"))
      val med = e.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("med"))
      val dev = e.join(broadcast(med), "event_type")
        .withColumn("ad", abs(col("value") - col("med")))
      val mad = dev.groupBy(col("event_type"))
        .agg(expr("percentile(ad, 0.5)").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          first(col("med")).as("med"),
          first(col("mad")).as("mad"),
          sum(when(col("ad") > lit(3d) * lit(1.4826) * col("mad"), 1L)
            .otherwise(0L)).as("n_anom"))
        .orderBy(col("event_type"))
    }),

    // EQUI-DEPTH decile gain table: customers ranked by lifetime
    // spend, cut into 10 equal-count buckets (ntile over a
    // deterministic total order — spend desc, custkey asc so ties
    // never make the bucketing engine-dependent), then per-decile
    // revenue share and cumulative share (the "top 10% of customers
    // drive X% of revenue" curve). Shape: one customer-keyed
    // aggregate, then the EXACT global ntile computed from a
    // range-partitioned two-phase rank (Packing.orderedPrefixSum +
    // ntileFromRank) — no single-task window anywhere: the range
    // exchange is the same one a global orderBy pays, every local
    // window is per-range-partition, and the only unpartitioned
    // window runs over the numShufflePartitions-row offset table.
    // The final agg is 10 rows.
    "q86_decile_gain" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // spend carried as integer cents end-to-end (q68 rule: double
      // sums are order-dependent across engines; integer sums are
      // exact and make the ntile order unambiguous)
      val spend = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * lit(100)).cast("long"))
          .as("s_cents"))
      // exact NTILE over |customers| WITHOUT a single-task window:
      // range-partitioned global rank + the closed-form bucket rule
      // (Packing.orderedPrefixSum/ntileFromRank)
      val nTot = spend.agg(count(lit(1)).as("n_total"))
      val dec = Packing.orderedPrefixSum(spend,
          Seq(col("s_cents").desc, col("o_custkey")), "s_cents")
        .crossJoin(broadcast(nTot))
        .withColumn("decile",
          Packing.ntileFromRank(col("rnk"), col("n_total"), 10)
            .cast("int"))
      val byDec = dec.groupBy(col("decile"))
        .agg(count(lit(1)).as("n_cust"), sum(col("s_cents")).as("rev_cents"))
      val wc = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy()
      byDec
        .withColumn("rev", col("rev_cents").cast("double") / lit(100.0))
        .withColumn("pct", col("rev_cents").cast("double")
          / sum(col("rev_cents")).over(wt).cast("double"))
        .withColumn("cum_pct",
          sum(col("rev_cents")).over(wc).cast("double")
            / sum(col("rev_cents")).over(wt).cast("double"))
        .select(col("decile"), col("n_cust"), col("rev"), col("pct"),
          col("cum_pct"))
        .orderBy(col("decile"))
    }),

    // LAST-TOUCH attribution: every purchase is credited to the most
    // recent preceding click's channel for that user (clicks carry a
    // synthetic channel derived from props.k; purchases with no prior
    // click are 'organic'). Shape: ONE user-keyed window does the
    // whole job — the q60 LOCF idiom (last_value ignoreNulls over an
    // unbounded-preceding frame) carries the channel forward through
    // each user's interleaved click/purchase timeline, so there is no
    // range join of purchases against click history (the naive shape,
    // quadratic in events per user). The frame is pre-filtered to the
    // two relevant event types at the scan (pushed filter), and the
    // window partitions on user_id — high cardinality, no skew. Final
    // agg is |channels| rows.
    "q87_last_touch_attribution" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"),
          when(col("event_type") === "click",
            concat(lit("ch_"),
              (get_json_object(col("props"), "$.k").cast("long") % 5)
                .cast("string"))).as("ch"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("attr", last(col("ch"), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("attr"), lit("organic")).as("channel"))
        // revenue summed as integer cents (q68 rule: double sums are
        // order-dependent across engines; integer sums are exact)
        .agg(count(lit(1)).as("n_purchases"),
          (sum(round(col("value") * lit(100)).cast("long")).cast("double")
            / lit(100.0)).as("revenue"))
        .orderBy(col("channel"))
    }),

    // REPEATED-PASSAGE span mining (the report behind d12's excision):
    // every maximal run of word 8-grams that also occur in at least
    // one OTHER document, per document, with 1-based token bounds —
    // the "which passages are boilerplate/copied, and how widely"
    // audit (Lee et al.'s dedup analysis shape) that decides excision
    // thresholds before d12 commits to them. Shape: the gram frame is
    // (doc_id, pos, hash) — the codegen'd per-position gram hashes,
    // never gram text; cross-doc frequency is a g-keyed count-distinct
    // over 8-byte keys (map-side partial agg collapses in-doc
    // repeats); flagged positions rejoin on g and the island merge
    // (pos - row_number) is a doc-local window. No text ever shuffles.
    "d15_repeated_spans" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val n = 8
      val pos = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(
          graft.functions.TextFunctions.wordGramHashes(col("text"), n)))
        .toDF("doc_id", "pos", "g")
      val dup = pos.groupBy(col("g"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_docs") >= 2)
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      pos.join(dup, "g")
        .withColumn("grp", col("pos") - row_number().over(w))
        .groupBy(col("doc_id"), col("grp"))
        .agg((min(col("pos")) + 1).cast("long").as("span_start"),
          (max(col("pos")) + n).cast("long").as("span_end"),
          count(lit(1)).as("n_grams"),
          max(col("n_docs")).as("max_doc_freq"))
        .select(col("doc_id"), col("span_start"), col("span_end"),
          col("n_grams"), col("max_doc_freq"))
        .orderBy(col("doc_id"), col("span_start"))
    }),

    // ZIPF slope per source: log-log OLS of term frequency against
    // frequency rank over each source's top terms. Natural text obeys
    // Zipf (slope near -1); a source whose slope collapses toward 0 is
    // template/machine output — this is a corpus-level quality screen
    // that catches what t02/t16's per-document scores cannot (a
    // thousand distinct documents stamped from one template each look
    // fine alone). Shape: term-frequency aggregate (the only full
    // exchange, partial-agg collapsed), a per-source top-100 window
    // over the |vocab per source| frame, then q58's closed-form OLS on
    // moments — each moment a Parity.dsum (decimal, order-independent)
    // so the slope is cross-engine exact; the result is |sources| rows.
    "t22_zipf_slope" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tf = Tables.documents(s, d)
        .select(col("source"),
          explode(split(trim(col("text")), " ")).as("term"))
        .groupBy(col("source"), col("term"))
        .agg(count(lit(1)).as("freq"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("freq").desc, col("term"))
      val rk = tf.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 100)
        .withColumn("x", log(col("rank").cast("double")))
        .withColumn("y", log(col("freq").cast("double")))
      rk.groupBy(col("source"))
        .agg(count(lit(1)).as("n_terms"),
          graft.Parity.dsum(col("x")).as("sx"),
          graft.Parity.dsum(col("y")).as("sy"),
          graft.Parity.dsum(col("x") * col("x")).as("sxx"),
          graft.Parity.dsum(col("x") * col("y")).as("sxy"))
        .withColumn("nd", col("n_terms").cast("double"))
        .withColumn("slope",
          (col("nd") * col("sxy") - col("sx") * col("sy"))
            / (col("nd") * col("sxx") - col("sx") * col("sx")))
        .withColumn("intercept",
          (col("sy") - col("slope") * col("sx")) / col("nd"))
        .select(col("source"), col("n_terms"), col("slope"),
          col("intercept"))
        .orderBy(col("source"))
    }),

    // WEEK-over-week revenue trend per order priority: ISO-week
    // rollup (integer cents), then lag-1 deltas within each priority
    // series. The standard KPI trend table. Shape: one grouped
    // aggregate (the only full-data exchange, partial-agg collapsed
    // to |priorities| x |weeks| rows map-side), then a window over
    // the tiny rollup. Week emitted as timestamp_ntz (q66 rule:
    // date32 breaks the driver hash on the pandas side).
    "q88_wow_trend" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wk = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"),
          date_trunc("week", col("o_orderdate")).cast("timestamp_ntz")
            .as("week"))
        .agg(sum(round(col("o_totalprice") * lit(100)).cast("long"))
          .as("rev_cents"))
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("week"))
      wk.withColumn("prev_cents", lag(col("rev_cents"), 1).over(w))
        .select(col("o_orderpriority"), col("week"),
          (col("rev_cents").cast("double") / lit(100.0)).as("rev"),
          (col("prev_cents").cast("double") / lit(100.0)).as("prev_rev"),
          ((col("rev_cents") - col("prev_cents")).cast("double")
            / col("prev_cents").cast("double")).as("wow_pct"))
        .orderBy(col("o_orderpriority"), col("week"))
    }),

    // Per-document TERM ENTROPY: Shannon entropy of each document's
    // term distribution plus the normalized form (entropy / ln of
    // distinct terms — 1.0 = uniform, low = a few terms dominate).
    // The within-document diversity screen that complements t11's
    // repetition ratios (a doc repeating one sentence has low entropy
    // long before its top-gram ratio trips). Shape: entirely doc-local
    // — term counts group on (doc, term) where the doc_id prefix keeps
    // the exchange aligned with the document partitioning, and the
    // entropy rollup groups on doc_id; each moment is a Parity.dsum
    // so the doubles are summation-order exact. The one raw (non-dsum)
    // log is ln(n_distinct): bit-identical across engines on integer
    // inputs (verified empirically, JVM intrinsic vs DuckDB libm,
    // 2..2000); any ulp noise in ln(p) is absorbed by dsum's decimal
    // rounding.
    "t23_term_entropy" -> ((s, d) => {
      val tf = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(split(trim(col("text")), " ")).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("freq"))
      val tot = tf.groupBy(col("doc_id"))
        .agg(sum(col("freq")).as("total"), count(lit(1)).as("n_distinct"))
      tf.join(tot, "doc_id")
        .withColumn("p", col("freq").cast("double")
          / col("total").cast("double"))
        .groupBy(col("doc_id"))
        .agg(first(col("n_distinct")).as("n_distinct"),
          first(col("total")).as("n_terms"),
          (-graft.Parity.dsum(col("p") * log(col("p")))).as("entropy"))
        .withColumn("norm_entropy",
          when(col("n_distinct") > 1,
            col("entropy") / log(col("n_distinct").cast("double")))
            .otherwise(lit(0d)))
        .select(col("doc_id"), col("n_terms"), col("n_distinct"),
          col("entropy"), col("norm_entropy"))
        .orderBy(col("doc_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q84_market_basket" ->
      """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         cnt AS (SELECT l_partkey, COUNT(*) AS c FROM b GROUP BY 1),
         freq AS (SELECT * FROM cnt WHERE c >= 20),
         fb AS (SELECT b.* FROM b JOIN freq USING (l_partkey)),
         nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM b),
         pairs AS (
           SELECT a.l_partkey AS part_a, b2.l_partkey AS part_b,
                  COUNT(*) AS pair_cnt
           FROM fb a JOIN fb b2
             ON a.l_orderkey = b2.l_orderkey AND a.l_partkey < b2.l_partkey
           GROUP BY 1, 2 HAVING COUNT(*) >= 3)
         SELECT p.part_a, p.part_b, p.pair_cnt,
                ca.c AS cnt_a, cb.c AS cnt_b,
                CAST(p.pair_cnt AS DOUBLE) / CAST(nb.n AS DOUBLE) AS support,
                CAST(p.pair_cnt AS DOUBLE) / CAST(ca.c AS DOUBLE) AS conf_a_b,
                CAST(p.pair_cnt AS DOUBLE) / CAST(cb.c AS DOUBLE) AS conf_b_a,
                CAST(p.pair_cnt AS DOUBLE) * CAST(nb.n AS DOUBLE)
                  / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)) AS lift
         FROM pairs p
         JOIN freq ca ON ca.l_partkey = p.part_a
         JOIN freq cb ON cb.l_partkey = p.part_b
         CROSS JOIN nb
         ORDER BY p.part_a, p.part_b""",

    "q85_robust_anomaly" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                      FROM events GROUP BY 1),
         dev AS (SELECT e.event_type, e.value, med.med,
                        abs(e.value - med.med) AS ad
                 FROM events e JOIN med USING (event_type)),
         mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad
                 FROM dev GROUP BY 1)
         SELECT d.event_type, COUNT(*) AS n,
                any_value(d.med) AS med, any_value(mad.mad) AS mad,
                CAST(SUM(CASE WHEN d.ad > 3 * 1.4826 * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anom
         FROM dev d JOIN mad USING (event_type)
         GROUP BY 1 ORDER BY 1""",

    "q86_decile_gain" ->
      """WITH spend AS (SELECT o_custkey,
                               SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                                 AS s_cents
                        FROM orders GROUP BY 1),
         dec AS (SELECT *, ntile(10) OVER (ORDER BY s_cents DESC, o_custkey)
                   AS decile FROM spend)
         SELECT decile, COUNT(*) AS n_cust,
                CAST(SUM(s_cents) AS DOUBLE) / 100.0 AS rev,
                CAST(SUM(s_cents) AS DOUBLE)
                  / CAST(SUM(SUM(s_cents)) OVER () AS DOUBLE) AS pct,
                CAST(SUM(SUM(s_cents)) OVER (ORDER BY decile
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                  / CAST(SUM(SUM(s_cents)) OVER () AS DOUBLE) AS cum_pct
         FROM dec GROUP BY 1 ORDER BY 1""",

    "q87_last_touch_attribution" ->
      """WITH tagged AS (
           SELECT user_id, ts, event_id, event_type, value,
                  CASE WHEN event_type = 'click'
                       THEN 'ch_' ||
                            CAST(CAST(props->>'k' AS BIGINT) % 5 AS VARCHAR)
                  END AS ch
           FROM events WHERE event_type IN ('click', 'purchase')),
         carried AS (
           SELECT *, last_value(ch IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS attr
           FROM tagged)
         SELECT COALESCE(attr, 'organic') AS channel,
                COUNT(*) AS n_purchases,
                CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                  / 100.0 AS revenue
         FROM carried WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY 1""",

    // string-gram equality stands in for the Spark side's gram-hash
    // equality (d03/d08 precedent: collision-free at oracle scale)
    "d15_repeated_spans" ->
      """WITH w AS (SELECT doc_id, string_split(TRIM(text), ' ') AS words
                    FROM documents),
         g AS (SELECT doc_id, i AS pos,
                      array_to_string(words[i:i+7], ' ') AS gram
               FROM w, UNNEST(generate_series(1, LEN(words) - 7)) AS t(i)),
         dup AS (SELECT gram, COUNT(DISTINCT doc_id) AS n_docs
                 FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
         f AS (SELECT g.doc_id, g.pos, dup.n_docs
               FROM g JOIN dup USING (gram)),
         isl AS (SELECT doc_id, pos, n_docs,
                   pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY pos) AS grp
                 FROM f)
         SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
                CAST(MAX(pos) + 7 AS BIGINT) AS span_end,
                COUNT(*) AS n_grams, MAX(n_docs) AS max_doc_freq
         FROM isl GROUP BY doc_id, grp
         ORDER BY doc_id, span_start""",

    "t22_zipf_slope" ->
      s"""WITH terms AS (SELECT source, UNNEST(string_split(TRIM(text), ' '))
                           AS term FROM documents),
         tf AS (SELECT source, term, COUNT(*) AS freq
                FROM terms GROUP BY 1, 2),
         rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                  ORDER BY freq DESC, term) AS rank FROM tf),
         xy AS (SELECT source, ln(CAST(rank AS DOUBLE)) AS x,
                       ln(CAST(freq AS DOUBLE)) AS y
                FROM rk WHERE rank <= 100),
         m AS (SELECT source, COUNT(*) AS n_terms,
                      ${graft.Parity.dsumSql("x")} AS sx,
                      ${graft.Parity.dsumSql("y")} AS sy,
                      ${graft.Parity.dsumSql("x * x")} AS sxx,
                      ${graft.Parity.dsumSql("x * y")} AS sxy
               FROM xy GROUP BY 1)
         SELECT source, n_terms,
                (CAST(n_terms AS DOUBLE) * sxy - sx * sy)
                  / (CAST(n_terms AS DOUBLE) * sxx - sx * sx) AS slope,
                (sy - ((CAST(n_terms AS DOUBLE) * sxy - sx * sy)
                  / (CAST(n_terms AS DOUBLE) * sxx - sx * sx)) * sx)
                  / CAST(n_terms AS DOUBLE) AS intercept
         FROM m ORDER BY source""",

    "q88_wow_trend" ->
      """WITH wk AS (SELECT o_orderpriority,
                            CAST(date_trunc('week', o_orderdate) AS TIMESTAMP)
                              AS week,
                            SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                              AS rev_cents
                     FROM orders GROUP BY 1, 2),
         lagged AS (SELECT *, lag(rev_cents, 1) OVER (
                      PARTITION BY o_orderpriority ORDER BY week)
                      AS prev_cents FROM wk)
         SELECT o_orderpriority, week,
                CAST(rev_cents AS DOUBLE) / 100.0 AS rev,
                CAST(prev_cents AS DOUBLE) / 100.0 AS prev_rev,
                CAST(rev_cents - prev_cents AS DOUBLE)
                  / CAST(prev_cents AS DOUBLE) AS wow_pct
         FROM lagged ORDER BY o_orderpriority, week""",

    "t23_term_entropy" ->
      s"""WITH terms AS (SELECT doc_id, UNNEST(string_split(TRIM(text), ' '))
                           AS term FROM documents),
         tf AS (SELECT doc_id, term, COUNT(*) AS freq
                FROM terms GROUP BY 1, 2),
         tot AS (SELECT doc_id, SUM(freq) AS total, COUNT(*) AS n_distinct
                 FROM tf GROUP BY 1),
         p AS (SELECT tf.doc_id, tot.total, tot.n_distinct,
                      CAST(freq AS DOUBLE) / CAST(total AS DOUBLE) AS p
               FROM tf JOIN tot USING (doc_id)),
         e AS (SELECT doc_id, any_value(total) AS n_terms,
                      any_value(n_distinct) AS n_distinct,
                      -(${graft.Parity.dsumSql("p * ln(p)")}) AS entropy
               FROM p GROUP BY 1)
         SELECT doc_id, CAST(n_terms AS BIGINT) AS n_terms, n_distinct,
                entropy,
                CASE WHEN n_distinct > 1
                     THEN entropy / ln(CAST(n_distinct AS DOUBLE))
                     ELSE 0.0 END AS norm_entropy
         FROM e ORDER BY doc_id"""
  )
}
