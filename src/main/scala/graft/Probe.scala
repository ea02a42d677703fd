package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMP dev probe (not committed): time sub-frames of hot queries. */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => DataFrame): DataFrame = {
      val t0 = System.nanoTime(); val df = f
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      df
    }
    Tables.lineitem(spark, d).write.format("noop").mode("overwrite").save()

    def perNoSpread = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .groupBy(col("l_orderkey"))
      .agg(sum(Parity.cents2(col("l_extendedprice"))).as("rev"))
      .select(col("l_orderkey"), expr("rev div 100").as("v"))
    def perSpread = Tables.spread(spark, Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_extendedprice")))
      .groupBy(col("l_orderkey"))
      .agg(sum(Parity.cents2(col("l_extendedprice"))).as("rev"))
      .select(col("l_orderkey"), expr("rev div 100").as("v"))

    def q170tail(per: DataFrame): DataFrame = {
      val b = 32
      import operators.Extended13.{poissonU, poissonW}
      val rep = per
        .select(col("l_orderkey"), col("v"),
          explode(sequence(lit(1), lit(b))).as("b"))
        .withColumn("u", poissonU(col("l_orderkey"), col("b")))
        .withColumn("w", poissonW(col("u")))
      val wsums = (1 to b).map(g =>
        sum(when(col("b") === g, col("w")).otherwise(0L)).as(s"w$g"))
      rep.groupBy(col("v"))
        .agg(sum(when(col("b") === 1, 1L).otherwise(0L)).as("c"),
          wsums: _*)
    }

    for (i <- 1 to 2) {
      println(s"--- pass $i ---")
      time("per:no_spread")(perNoSpread)
      time("per:spread")(perSpread)
      time("q170grid:no_spread")(q170tail(perNoSpread))
      time("q170grid:spread")(q170tail(perSpread))
      time("q170grid:no_spread_repart_after")(q170tail(
        perNoSpread.repartition(spark.sparkContext.defaultParallelism)))
    }
    spark.stop()
  }
}
