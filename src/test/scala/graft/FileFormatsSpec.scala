package graft

import org.apache.spark.sql.functions._

/** File batch scans beyond parquet (SURVEY.md §2.2 "File batch scan
  * (Parquet/JSON/CSV)"): round-trip the events table through JSON and CSV
  * and confirm identical content.
  */
class FileFormatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("JSON scan round-trips events content") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    val src = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    src.write.mode("overwrite").json(s"$tmp/ev-json")
    val back = spark.read.schema(src.schema).json(s"$tmp/ev-json")
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("ORC scan round-trips events content (columnar alternative to " +
      "parquet, with predicate pushdown)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    val src = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    src.write.mode("overwrite").orc(s"$tmp/ev-orc")
    val back = spark.read.orc(s"$tmp/ev-orc")
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    // pushdown reaches the ORC scan like the parquet q02 contract
    val plan = back.filter(col("value") > 100.0).queryExecution
      .explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters: [IsNotNull(value), " +
      "GreaterThan(value,100.0)]"), plan.take(800))
  }

  test("CSV scan (header + explicit schema) round-trips events content") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    val src = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
    src.write.mode("overwrite").option("header", "true").csv(s"$tmp/ev-csv")
    val back = spark.read.option("header", "true").schema(src.schema)
      .csv(s"$tmp/ev-csv")
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }
}
