package graft

/** Dev utility: print the query/oracle registry sizes and any mismatch. */
object CountQ {
  def main(a: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size}")
    println("no-oracle: " + (q -- o).toSeq.sorted.mkString(","))
    println("orphan-oracle: " + (o -- q).toSeq.sorted.mkString(","))
  }
}
