package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run one named SparkEntry query and print its row count,
  * timing, and optionally the plan. Usage:
  *   runMain graft.RunQuery <name> [sfDir] [--show] [--explain]
  *     [--times N]    N >= 1 runs; prints min + all samples
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).filterNot(_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("--explain")) df.explain("formatted")
    val times = args.indexOf("--times") match {
      case -1 => 1
      case i =>
        val n = args.lift(i + 1).flatMap(_.toIntOption).getOrElse(
          sys.error("--times requires a positive integer argument"))
        require(n >= 1, s"--times must be >= 1; got $n")
        n
    }
    // --noop: force end-to-end through the noop sink exactly like Bench
    // (count() lets Catalyst prune unneeded aggregate/window columns, so
    // count timings can be a fraction of the real query cost)
    val noop = args.contains("--noop")
    var n = 0L
    val secs = (1 to times).map { _ =>
      val t0 = System.nanoTime()
      val df2 = SparkEntry.queries(name)(spark, sfDir)
      if (noop) df2.write.format("noop").mode("overwrite").save()
      else n = df2.count()
      (System.nanoTime() - t0) / 1e9
    }
    if (args.contains("--show")) df.show(20, truncate = false)
    println(f"[runquery] $name rows=$n sec=${secs.min}%.3f " +
      f"all=${secs.map(s => f"$s%.3f").mkString(",")} sf=$sfDir")
    spark.stop()
  }
}
