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
    val listener = new Bench.MetricsListener
    spark.sparkContext.addSparkListener(listener)
    def time(name: String, explain: Boolean = false)(f: => DataFrame): Unit = {
      listener.reset()
      val t0 = System.nanoTime(); val df = f
      if (explain) df.explain("formatted")
      df.write.format("noop").mode("overwrite").save()
      Thread.sleep(200)
      val mb = (listener.shuffleRead.get + listener.shuffleWrite.get) / 1048576.0
      println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.3f s  shuffle $mb%.1f MB")
    }
    Tables.lineitem(spark, d).write.format("noop").mode("overwrite").save()

    def wk = operators.Extended13.nationWeeklyRevenue(spark, d)

    def q179tail(wkf: DataFrame): DataFrame = {
      val weeks = wkf.groupBy(col("nation"))
        .agg(count(lit(1)).as("n_weeks"))
      wkf.as("a").join(broadcast(wkf.as("b")),
          col("a.nation") === col("b.nation") && col("a.w") =!= col("b.w"))
        .select(col("a.nation").as("nation"), col("a.w").as("wi"),
          ((col("b.y") - col("a.y")).cast("double") /
            (col("b.w") - col("a.w")).cast("double")).as("slope"),
          col("b.w").as("wj"))
        .groupBy(col("nation"), col("wi"))
        .agg(sort_array(collect_list(struct(col("slope"), col("wj"))))
          .as("sl"))
        .join(broadcast(weeks), "nation")
        .select(col("nation"), col("n_weeks"), col("wi"),
          element_at(col("sl"), expr("CAST(n_weeks div 2 AS INT)"))
            .getField("slope").as("med_i"))
        .groupBy(col("nation"))
        .agg(max(col("n_weeks")).as("n_weeks"),
          sort_array(collect_list(struct(col("med_i"), col("wi"))))
            .as("ml"))
        .select(col("nation"), col("n_weeks"),
          element_at(col("ml"), expr("CAST((n_weeks + 1) div 2 AS INT)"))
            .getField("med_i").as("siegel_slope"))
        .orderBy(col("nation"))
    }

    for (i <- 1 to 2) {
      println(s"--- pass $i ---")
      time("wk(carrier)")(wk)
      val cut = wk
      time("q179tail", explain = i == 1)(q179tail(cut))
    }
    spark.stop()
  }
}
