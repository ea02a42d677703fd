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
  /** events.parquet has shipped `ts` as either TIMESTAMP(NANOS) (which
    * Spark 4 refuses by default) or plain TIMESTAMP(MICROS), depending on
    * the generator version — adapt to whichever this dataset carries.
    * Nanos are read as long and truncated to microseconds — exactly what
    * DuckDB's TIMESTAMP cast does, so oracle comparisons line up; micros
    * need only the NTZ normalization.
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
    val raw = table(s, d, "events")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos read as long
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
      case _ => col("ts").cast("timestamp_ntz")
    }
    raw.withColumn("ts", ts)
  }
  /** The corpus tables ship as single-row-group parquet files — ONE
    * scan split no matter the core count — so every pre-exchange map
    * stage over them (gram hashing, centroid assignment, payload
    * decode: the heaviest per-row work in the engine) would execute in
    * a single task. Repartition immediately after the read (the
    * optimization guide's unsplittable-input rule, §2.5), but ONLY
    * when the scan is actually narrower than the session parallelism:
    * a production-scale table with real splits passes through
    * untouched, so this stays scale-adaptive rather than a local[32]
    * constant. Filters/pruning still reach the scan — Catalyst pushes
    * predicates and column pruning through Repartition. */
  /** [[spreadIfNarrow]] for operator code: project the frame to the
    * columns you need FIRST (only those bytes cross the round-robin
    * exchange), then spread — used by the heavy rollup carriers whose
    * first stage (scan + broadcast-join probes + partial aggregate)
    * would otherwise run inside the single scan task. */
  def spread(s: SparkSession, df: DataFrame): DataFrame =
    spreadIfNarrow(s, df)

  private def spreadIfNarrow(s: SparkSession, df: DataFrame): DataFrame = {
    val p = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < p) df.repartition(p) else df
  }

  def documents(s: SparkSession, d: String): DataFrame =
    spreadIfNarrow(s, table(s, d, "documents"))

  /** The unspread documents scan, for the few consumers whose per-row
    * work is too light to repay the round-robin exchange (m08's
    * octet-length manifest: measured 4.6 s spread vs 1.0 s unspread at
    * sf0.1 — the exchange dominates a trivial map). */
  def documentsNarrow(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    spreadIfNarrow(s, table(s, d, "embeddings"))
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

  /** A fixed-2dp value as an exact scaled long (`round(x*100)`), the
    * input form for [[scaledSum]]. Exact because the source columns hold
    * 2-decimal business values; the double noise of `x*100` is far below
    * the 0.5 rounding margin. */
  def cents2(c: Column): Column = round(c * 100).cast("long")

  /** Exact sum of a scaled-integer measure, surfaced as the same double
    * [[dsum]] produces — at nearly the speed of a plain double sum.
    *
    * Rationale: `dsum` pays a per-ROW decimal conversion + decimal add
    * (~3.6x slower than a double sum on TPC-H Q1). Here every row is an
    * exact long (2dp columns scaled by 100; products of up to three of
    * them scaled by 10^4/10^6), the hot loop is codegen'd long addition,
    * and ONE decimal division per GROUP converts back. The division
    * result carries scale >= 6, so it is the exact rational, and the
    * final double cast rounds once — bit-identical to `dsum` / the
    * DuckDB twin (spec-pinned in ParitySpec).
    *
    * Overflow SAFETY (not just a bound): the long accumulator holds
    * |sum| < 9.2e18 — at scale 10^6 only ~9.2e12 value units per group,
    * which a warehouse-scale group CAN exceed (TPC-H sf>~150). Overflow
    * can therefore never be silent:
    *  - under ANSI mode (the Spark 4 default) `sum(long)` itself
    *    hard-fails on overflow — nothing extra needed;
    *  - with ANSI off (checked per session at plan build) a SHADOW
    *    double sum rides along and the result raises an error whenever
    *    |longSum - shadowSum| > 1e17. A wrap shifts the long sum by a
    *    multiple of 2^64 ~ 1.8e19 while the shadow tracks the true sum
    *    within n*2^-52*|sum| (< 1e17 for any n up to ~5e13 rows/group),
    *    so every wrap is detected and no plausible group is misflagged.
    * Either way the fast path stays well ahead of [[dsum]], which
    * remains the fallback for workloads whose per-group totals
    * genuinely exceed Long range.
    */
  def scaledSum(scaled: Column, scale: Int): Column = {
    require(scale >= 0 && scale <= 18)
    val divisor = math.pow(10, scale).toLong
    val exact = sum(scaled)
    val ansiOn = org.apache.spark.sql.SparkSession.getActiveSession
      .forall(_.conf.get("spark.sql.ansi.enabled", "true") == "true")
    val guarded = if (ansiOn) exact else {
      val shadow = sum(scaled.cast("double"))
      when(
        exact.isNull || abs(exact.cast("double") - shadow) <= lit(1e17), exact)
        .otherwise(raise_error(concat(
          lit("Parity.scaledSum: long accumulator overflow (wrapped sum="),
          exact.cast("string"), lit(", shadow="), shadow.cast("string"),
          lit(") — use Parity.dsum for this group size"))).cast("long"))
    }
    (guarded.cast(DecimalType(38, 0)) / lit(divisor)).cast("double")
  }

  /** Order-insensitive average of a 2dp column via [[scaledSum]]:
    * exact-sum-as-double / count, matching [[davg]] bit-for-bit. */
  def scaledAvg(scaled: Column, scale: Int): Column =
    (scaledSum(scaled, scale) / count(scaled)).cast("double")
}
