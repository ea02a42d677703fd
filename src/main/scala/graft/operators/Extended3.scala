package graft.operators

import graft.{Parity, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 widening of the analytical surface (SURVEY.md §2.2):
  *
  *  - '''Variant shredding''' (q53): Spark 4's `VARIANT` type
  *    (`parse_json` / `variant_get`) — the scale path for
  *    semi-structured payload decode. Unlike `from_json` with a full
  *    schema, a variant is parsed once into a binary-shredded form and
  *    each `variant_get` extracts one path without re-tokenizing, which
  *    is the right trade at 100 TB where payloads are wide but queries
  *    touch few paths (the reference leaves payload decode entirely to
  *    user code — README.md:246-293 — so this is the engine-internalized
  *    form of that slot).
  *  - '''XML decode''' (q54): `from_xml` payload decoding, the markup
  *    twin of q32 `from_json` / q39 `from_csv` — completes the
  *    text-payload codec family.
  *  - '''Bucketed co-located join''' (q55): both join sides CTAS'd as
  *    bucketed tables on the join key → the sort-merge join reads
  *    bucket-aligned splits and the plan has NO shuffle exchange
  *    (asserted by PlanShapeSpec). At 100 TB this is the difference
  *    between re-shuffling the fact table on every join and paying the
  *    partitioning once at write time — the classic warehouse layout
  *    for repeated star joins.
  *  - '''Time-range window frame''' (q56): `rangeBetween` over event-time
  *    micros (count/sum over the trailing hour per user) — the frame
  *    variant q14 (rows) doesn't cover; range frames include value peers,
  *    so results are deterministic under any tie order.
  *  - '''Partial-aggregate exact top-k ANN''' (e04): same result as
  *    e02's window ranking, but neighbor selection happens in
  *    [[graft.functions.TopKAggregate]] — partial aggregation keeps the
  *    per-vector top-k map-side, so the shuffle carries at most k pairs
  *    per vector instead of the full O(n²) pair stream the window sort
  *    would move. This is the scale shape for "k nearest per key";
  *    oracle-identical to brute force (deterministic value-desc/id-asc
  *    tiebreak).
  */
object Extended3 {

  /** Bucket count for q55 — fixed so plans are stable across SFs. */
  private val NumBuckets = 8

  /** Drop a managed table AND its warehouse directory. A previous
    * SparkSession may have left the data directory behind (the in-memory
    * catalog forgets the table on session exit but the files persist),
    * in which case `mode(overwrite)` alone fails with
    * LOCATION_ALREADY_EXISTS. */
  private[operators] def dropManaged(s: SparkSession, name: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(wh, name)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) { fs.delete(path, true); () }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // VARIANT decode: parse once, extract typed paths. A missing path is
    // SQL NULL (not an error) — schema drift tolerance the strict
    // from_json path lacks.
    "q53_variant_shred" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("var", expr("parse_json(props)"))
        .select(col("event_id"),
          expr("variant_get(var, '$.k', 'int')").as("k_val"),
          expr("variant_get(var, '$.k', 'double')").as("k_dbl"),
          expr("variant_get(var, '$.nope', 'string')").as("missing"))
        .orderBy(col("event_id"))
    }),

    // XML payload decode: encode a struct as markup, parse it back with
    // from_xml — markup twin of the q39 CSV round-trip.
    "q54_xml_decode" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("x", concat(lit("<o><k>"), col("o_orderkey"),
          lit("</k><p>"), col("o_orderpriority"), lit("</p></o>")))
        .withColumn("parsed", expr("from_xml(x, 'k BIGINT, p STRING')"))
        .select(col("o_orderkey"), col("x"),
          col("parsed.k").as("k"), col("parsed.p").as("p"))
        .orderBy(col("o_orderkey"))
    }),

    // Co-located join on bucketed tables: pay the shuffle once at write
    // (bucketBy o_custkey / c_custkey), then every subsequent join on the
    // bucket key is exchange-free (merge hint pins SMJ so the broadcast
    // path doesn't mask the layout win at test SFs).
    "q55_bucketed_colocated_join" -> ((s, d) => {
      dropManaged(s, "graft_orders_bucketed")
      dropManaged(s, "graft_customer_bucketed")
      Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").format("parquet")
        .bucketBy(NumBuckets, "o_custkey").sortBy("o_custkey")
        .saveAsTable("graft_orders_bucketed")
      Tables.customer(s, d).select("c_custkey", "c_mktsegment")
        .write.mode("overwrite").format("parquet")
        .bucketBy(NumBuckets, "c_custkey").sortBy("c_custkey")
        .saveAsTable("graft_customer_bucketed")
      s.table("graft_orders_bucketed").hint("merge")
        .join(s.table("graft_customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          Parity.dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("c_mktsegment"))
    }),

    // Trailing-1h event-time range frame per user: range frames bound by
    // VALUE (micros), not row position — peers at the same timestamp are
    // always in-frame together, so the result is tie-order independent.
    "q56_time_range_window" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"))
        .rangeBetween(-3600000000L, 0L) // 1 hour in micros, inclusive
      Tables.events(s, d)
        .withColumn("us", expr("unix_micros(CAST(ts AS TIMESTAMP))"))
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("k")).over(w).as("k_sum_1h"))
        .orderBy(col("event_id"))
    }),

    // Exact top-3 neighbors via the mergeable top-k aggregate: identical
    // output to e02, but the O(n²) pair stream is reduced map-side — the
    // exchange moves ≤ k entries per vector. Symmetry halves the float
    // work: each unordered pair is joined ONCE (a < b), the cosine is
    // computed once, and the pair then fans into both endpoints' top-k
    // groups (cos(a,b) = cos(b,a)).
    "e04_ann_topk_partial" -> ((s, d) => {
      val v = Similarity.vecs(s, d)
      val a = v.select(col("vec_id").as("ia"), col("v").as("va"),
        col("nrm").as("na"))
      val b = v.select(col("vec_id").as("ib"), col("v").as("vb"),
        col("nrm").as("nb"))
      a.join(b, col("ia") < col("ib"))
        .withColumn("cos",
          graft.functions.VectorFunctions.dotProduct(col("va"), col("vb"))
            / (col("na") * col("nb")))
        .select(explode(array(
          struct(col("ia").as("vec_id"), col("ib").as("neighbor_id"),
            col("cos")),
          struct(col("ib").as("vec_id"), col("ia").as("neighbor_id"),
            col("cos")))).as("e"))
        .groupBy(col("e.vec_id").as("vec_id"))
        .agg(graft.functions.TopKFunctions.topK(
          col("e.cos"), col("e.neighbor_id"), 3).as("t"))
        .select(col("vec_id"), posexplode(col("t")))
        .select(col("vec_id"), (col("pos") + 1).cast("int").as("rank"),
          col("col.id").as("neighbor_id"), col("col.value").as("cos"))
        .orderBy(col("vec_id"), col("rank"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q53_variant_shred" ->
      """SELECT event_id,
         CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_dbl,
         json_extract_string(props, '$.nope') AS missing
         FROM events ORDER BY event_id""",

    "q54_xml_decode" ->
      """SELECT o_orderkey,
         '<o><k>' || o_orderkey || '</k><p>' || o_orderpriority
           || '</p></o>' AS x,
         o_orderkey AS k, o_orderpriority AS p
         FROM orders ORDER BY o_orderkey""",

    "q55_bucketed_colocated_join" ->
      s"""SELECT c_mktsegment, COUNT(1) AS n_orders,
         ${Parity.dsumSql("o_totalprice")} AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q56_time_range_window" ->
      """SELECT event_id, user_id,
         CAST(COUNT(1) OVER w AS BIGINT) AS n_1h,
         CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) OVER w
           AS BIGINT) AS k_sum_1h
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    // same oracle as the brute-force ranking — the sketch path must be
    // indistinguishable from it
    "e04_ann_topk_partial" ->
      """SELECT vec_id, CAST(rank AS INT) AS rank, neighbor_id, cos FROM (
           SELECT a.vec_id, b.vec_id AS neighbor_id,
                  list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])) /
                  (SQRT(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                         CAST(a.embedding AS DOUBLE[]))) *
                   SQRT(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[]))))
                    AS cos,
                  ROW_NUMBER() OVER (PARTITION BY a.vec_id
                    ORDER BY list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])) /
                  (SQRT(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                         CAST(a.embedding AS DOUBLE[]))) *
                   SQRT(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[]))))
                      DESC, b.vec_id) AS rank
           FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id) t
         WHERE rank <= 3 ORDER BY vec_id, rank"""
  )
}
