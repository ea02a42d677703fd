package graft

/** One-off audit main (test scope): counts physical parquet-scan nodes
  * per registered query and flags queries whose scan count exceeds the
  * number of DISTINCT tables they read — i.e. the same table's subtree
  * is evaluated more than once. Some of those are by design (self-join
  * pair scans, method-comparison queries that run k member pipelines);
  * the audit surfaces them for adjudication, it does not fail.
  *
  * Run: sbt "Test/runMain graft.ScanAudit /root/testdata/sf0.001"
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("scan-audit")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    graft.functions.GraftFunctions.register(spark)
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val p = fn(spark, dir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode
              .fromString("formatted"))
          val scans = p.split("\n")
            .filter(_.matches("\\(\\d+\\) Scan parquet.*"))
          val locs = p.split("\n").filter(_.contains("Location:"))
            .map(_.replaceAll(".*\\[", "").replaceAll("\\].*", ""))
          val distinctTables = locs.distinct.length.max(1)
          Some((name, scans.length, distinctTables))
        } catch {
          case e: Throwable =>
            println(s"[audit] $name ERROR ${e.getMessage.take(80)}")
            None
        }
    }
    val flagged = rows.filter { case (_, n, d) => n > d }
    println(s"[audit] ${rows.size} queries; " +
      s"${flagged.size} evaluate a table subtree more than once:")
    flagged.sortBy { case (_, n, d) => d - n }.foreach {
      case (name, n, d) => println(f"[audit]   $name%-34s scans=$n distinct=$d")
    }
    spark.stop()
  }
}
