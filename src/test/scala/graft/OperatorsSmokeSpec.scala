package graft

/** Smoke: every registered query executes at sf0.001 and the flagship
  * returns rows (the driver's t1 gate). Full value-level verification
  * runs against the DuckDB oracle via graft.Verify + tools/compare.py.
  */
class OperatorsSmokeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query/oracle key pair is consistent") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracleSql without queries entry: $orphans")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val n = fn(spark, dir).count()
      assert(n >= 0)
    }
  }
}
