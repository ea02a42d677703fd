package graft

import org.apache.spark.sql.functions._

/** AQE skew handling — the runtime answer to hot keys at 100 TB
  * (SURVEY.md §4 "AQE skew handling"): a sort-merge join with one
  * pathologically hot key is split into multiple tasks by
  * OptimizeSkewedJoin instead of serializing the whole key on one task.
  * (The complementary COMPILE-time pattern — explicit salting — is
  * exercised as query q33.)
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join partition") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "100KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // left: key 0 carries 300k rows (hot), keys 1..31 carry 100 each;
      // v is md5 hex (incompressible) so the hot partition's COMPRESSED
      // shuffle size — what AQE's skew detection sees — stays large
      val hot = spark.range(300000).select(lit(0L).as("k"),
        md5(concat(lit("x"), col("id"))).as("v"))
      val rest = spark.range(3100).select((col("id") % 31 + 1).as("k"),
        md5(concat(lit("y"), col("id"))).as("v"))
      val left = hot.unionAll(rest)
      val right = spark.range(32).select(col("id").as("k"),
        concat(lit("dim-"), col("id")).as("d"))
        .repartition(32) // force a shuffle side so SMJ applies
      val j = left.join(right, "k").groupBy("k")
        .agg(count(lit(1)).as("n"), max(col("v")).as("vmax"))
      val rows = j.collect()
      assert(rows.map(_.getLong(1)).sum == 303100)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark the join:\n${plan.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
