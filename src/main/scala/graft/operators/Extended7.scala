package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Seventh analytics batch: warehouse data-quality and logistics
  * profiling — the referential-integrity audit every ingest gate runs
  * before a snapshot is published, and the supplier lead-time table
  * behind delivery SLAs.
  *
  * Same contract as Extended5/6: declarative plans, integer carriers
  * until one final double projection, and a scale note per entry for
  * the 1000-executor / 100 TB shape.
  */
object Extended7 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // REFERENTIAL-INTEGRITY audit: for every foreign-key edge of the
    // star schema, total child rows and orphans (child keys with no
    // parent). The publish gate of any warehouse ingest — a nonzero
    // orphan row here means a partial load or a dropped dimension
    // delta, caught before a downstream inner join silently loses
    // rows. Scale shape: each edge first collapses the child side
    // MAP-SIDE to distinct keys with counts (the fact table's key
    // multiplicity is tiny relative to its width, so the one exchange
    // per edge carries 8-byte keys + a long, never fact rows), parents
    // project to distinct keys (dim-sized edges broadcast), and each
    // edge reduces to a 1-row aggregate before the 7-row union.
    "q96_fk_integrity_audit" -> ((s, d) => {
      def edge(name: String, child: DataFrame, ckey: String,
          parent: DataFrame, pkey: String, bcast: Boolean): DataFrame = {
        val keys = parent.select(col(pkey).as("k")).distinct()
          .withColumn("hit", lit(1))
        val p = if (bcast) broadcast(keys) else keys
        child.groupBy(col(ckey).as("k")).agg(count(lit(1)).as("cnt"))
          .join(p, Seq("k"), "left")
          .agg(sum(col("cnt")).as("child_rows"),
            sum(when(col("hit").isNull, col("cnt")).otherwise(0L))
              .as("orphans"))
          .withColumn("edge", lit(name))
      }
      val li = Tables.lineitem(s, d)
      val edges = Seq(
        edge("customer->nation", Tables.customer(s, d), "c_nationkey",
          Tables.nation(s, d), "n_nationkey", bcast = true),
        edge("lineitem->orders", li, "l_orderkey",
          Tables.orders(s, d), "o_orderkey", bcast = false),
        edge("lineitem->part", li, "l_partkey",
          Tables.part(s, d), "p_partkey", bcast = false),
        edge("lineitem->supplier", li, "l_suppkey",
          Tables.supplier(s, d), "s_suppkey", bcast = false),
        edge("nation->region", Tables.nation(s, d), "n_regionkey",
          Tables.region(s, d), "r_regionkey", bcast = true),
        edge("orders->customer", Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey", bcast = false),
        edge("supplier->nation", Tables.supplier(s, d), "s_nationkey",
          Tables.nation(s, d), "n_nationkey", bcast = true))
      edges.reduce(_.unionByName(_))
        .withColumn("orphan_pct",
          col("orphans").cast("double") / col("child_rows").cast("double"))
        .select(col("edge"), col("child_rows"), col("orphans"),
          col("orphan_pct"))
        .orderBy(col("edge"))
    }),

    // Supplier FULFILLMENT-LAG profile by nation: days from order
    // placement to line shipment, and the slow-fulfillment rate
    // (lag > 90 days), rolled up per supplier nation — the
    // logistics-SLA table behind "which supply region is slipping".
    // Scale shape: the one fact-fact join (lineitem × orders) carries
    // only (orderkey, suppkey, shipdate) vs (orderkey, orderdate) —
    // 8-byte keys plus a date each side, never fact width; lag/slow
    // are row-local integer date arithmetic after the join; supplier
    // joins on its key and nation broadcasts; the rollup
    // partial-aggregates map-side to |nations| rows. Integer sums
    // end-to-end, two divisions at the final projection. At warehouse
    // scale, bucket both fact tables by orderkey (q55's layout) and
    // this join goes exchange-free.
    "q97_fulfillment_lag" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"))
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))
      val nat = broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name")))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .withColumn("lag_days",
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
        .withColumn("slow",
          when(col("lag_days") > 90L, 1L).otherwise(0L))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("lag_days")).as("total_lag_days"),
          max(col("lag_days")).as("max_lag_days"),
          sum(col("slow")).as("n_slow"))
        .withColumn("mean_lag_days",
          col("total_lag_days").cast("double")
            / col("n_items").cast("double"))
        .withColumn("slow_rate",
          col("n_slow").cast("double") / col("n_items").cast("double"))
        .select(col("n_name"), col("n_items"), col("total_lag_days"),
          col("max_lag_days"), col("n_slow"), col("mean_lag_days"),
          col("slow_rate"))
        .orderBy(col("n_name"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q96_fk_integrity_audit" -> {
      def edge(name: String, child: String, ckey: String,
          parent: String, pkey: String): String =
        s"""SELECT '$name' AS edge, COUNT(1) AS child_rows,
           CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS orphans,
           CAST(CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE)
             AS orphan_pct
           FROM (SELECT $ckey AS k FROM $child) c
           LEFT JOIN (SELECT DISTINCT $pkey AS k FROM $parent) p
             ON c.k = p.k"""
      Seq(
        edge("customer->nation", "customer", "c_nationkey",
          "nation", "n_nationkey"),
        edge("lineitem->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        edge("lineitem->part", "lineitem", "l_partkey",
          "part", "p_partkey"),
        edge("lineitem->supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        edge("nation->region", "nation", "n_regionkey",
          "region", "r_regionkey"),
        edge("orders->customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        edge("supplier->nation", "supplier", "s_nationkey",
          "nation", "n_nationkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY edge")
    },

    "q97_fulfillment_lag" ->
      """WITH li AS (SELECT l_suppkey,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
             CAST(l_shipdate AS DATE)) AS BIGINT) AS lag_days
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         lg AS (SELECT l_suppkey, lag_days,
           CASE WHEN lag_days > 90 THEN 1 ELSE 0 END AS slow FROM li)
         SELECT n_name, COUNT(1) AS n_items,
           CAST(SUM(lag_days) AS BIGINT) AS total_lag_days,
           MAX(lag_days) AS max_lag_days,
           CAST(SUM(slow) AS BIGINT) AS n_slow,
           CAST(CAST(SUM(lag_days) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(1) AS DOUBLE) AS mean_lag_days,
           CAST(CAST(SUM(slow) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(1) AS DOUBLE) AS slow_rate
         FROM lg
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name"""
  )
}
