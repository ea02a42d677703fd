package graft

import graft.functions.QuantileSketchFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The KMV quantile sketch must be a pure function of the value SET —
  * same result at any parallelism / merge order — and exact when the
  * distinct-value count fits the buffer.
  */
class QuantileSketchSpec extends SparkSpec {

  private def sketch(df: DataFrame, k: Int): Array[Double] = {
    val hashed = df.withColumn("h",
      conv(substring(md5(encode(col("v").cast("string"), "UTF-8")), 1, 15),
        16, 10).cast("long"))
    hashed.agg(QuantileSketchFunctions
        .quantileSketch(col("h"), col("v"), k, Seq(0.25, 0.5, 0.9, 0.99))
        .as("qs"))
      .collect()(0).getSeq[Double](0).toArray
  }

  test("exact type-7 quantiles when distinct values <= k") {
    import spark.implicits._
    // values 0..100 once each: sample = full set, quantiles exact
    val df = (0L to 100L).toDF("v")
    val qs = sketch(df, 128)
    assert(qs.toSeq == Seq(25.0, 50.0, 90.0, 99.0))
  }

  test("deterministic under repartitioning and duplication (pure function " +
      "of the value set)") {
    import spark.implicits._
    val vals = (1L to 5000L).map(v => v * 37 % 4096)
    val one = sketch(vals.toDF("v").coalesce(1), 64)
    val many = sketch(vals.toDF("v").repartition(13), 64)
    val dups = sketch((vals ++ vals ++ vals).toDF("v").repartition(7), 64)
    assert(one.toSeq == many.toSeq)
    assert(one.toSeq == dups.toSeq)
  }

  test("bounded error: p50 estimate from k=256 within 10% of true median") {
    import spark.implicits._
    val df = (1L to 100000L).toDF("v")
    val qs = sketch(df, 256)
    assert(math.abs(qs(1) - 50000.0) / 50000.0 < 0.10, qs.mkString(","))
  }

  test("invalid arguments fail analysis with a clear error (k < 1, " +
      "percentile outside [0,1], non-bigint inputs)") {
    import spark.implicits._
    val df = (1L to 10L).toDF("v")
    df.createOrReplaceTempView("qs_args_in")
    graft.functions.GraftFunctions.register(spark)
    def err(sql: String): String = {
      val e = intercept[Exception](spark.sql(sql).collect())
      def msgs(t: Throwable): String =
        if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
      msgs(e)
    }
    assert(err("SELECT quantile_sketch(v, v, 0, 0.5) FROM qs_args_in")
      .contains("k must be >= 1"))
    assert(err("SELECT quantile_sketch(v, v, 64, 1.5) FROM qs_args_in")
      .contains("percentiles must be in [0, 1]"))
    assert(err("SELECT quantile_sketch(v, v, 64) FROM qs_args_in")
      .contains("at least one percentile"))
    assert(err("SELECT quantile_sketch(CAST(v AS STRING), v, 64, 0.5) " +
      "FROM qs_args_in").contains("must be BIGINT"))
  }

  test("q52 plan: partial aggregation runs map-side (objHashAggregate " +
      "partial_quantile_sketch before the exchange)") {
    val df = graft.operators.CustomAgg.queries("q52_quantile_sketch")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_quantile_sketch"), plan.take(2000))
  }
}
