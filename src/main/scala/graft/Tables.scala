package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Parquet table loaders for the driver-generated TPC-H-ish star schema
  * (TESTDATA.md). All queries read through here so scans stay uniform
  * (vectorized parquet reader, pushdown-friendly: no caching, no RDDs).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark 4 refuses
    * by default. Read nanos as long and truncate to microseconds — exactly
    * what DuckDB's TIMESTAMP cast does, so oracle comparisons line up.
    *
    * NB: `nanosAsLong` is a session-wide flag with no per-read form, and
    * it is read lazily at scan execution, so it must stay set for the
    * session (restoring it immediately would break the returned plan).
    * Session-wide it is harmless here: it only affects TIMESTAMP(NANOS)
    * parquet columns, and every nanos read in this engine goes through
    * this method. A deployment mixing nanos datasets with different
    * expectations would scope sessions via SparkSession.newSession().
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // TIMESTAMP_NTZ so outputs round-trip as naive microseconds — the
    // exact representation DuckDB produces for its TIMESTAMP
    table(s, d, "events")
      .withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** Oracle-parity helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * `oracleSql` on the same tables. Floating-point SUMs are order-dependent,
  * so any money/measure aggregation goes through exact DECIMAL arithmetic
  * on both sides and is only cast back to DOUBLE at the end — the final
  * double is then bit-identical regardless of partitioning/merge order.
  * Scale 6 matters: measure expressions are products of up-to-three 2-dp
  * values, i.e. exact 6-dp decimals. Rounding those at a coarser scale
  * hits true decimal ties (x.xxxx50) where Spark (HALF_UP on the double's
  * shortest repr) and DuckDB (binary value) disagree; at scale 6 there is
  * no rounding at all, so both engines agree bit-for-bit.
  * DuckDB twin: `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`.
  */
object Parity {
  /** Exact decimal sum of a double column, surfaced as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Order-insensitive average: exact decimal sum / count, in doubles. */
  def davg(c: Column): Column =
    (sum(c.cast(DecimalType(18, 6))).cast("double") / count(c)).cast("double")

  /** SQL twin of [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,6))) AS DOUBLE)"

  /** SQL twin of [[davg]]. */
  def davgSql(expr: String): String =
    s"CAST(CAST(SUM(CAST(($expr) AS DECIMAL(18,6))) AS DOUBLE) / COUNT($expr) AS DOUBLE)"
}
