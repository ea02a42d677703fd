package graft

import org.apache.spark.sql.functions._

/** Pins the O(log diameter) convergence claim of the path-halving
  * label propagation — the property the 100 TB design rests on — plus
  * correctness on disjoint components and singletons.
  */
class ConnectedComponentsSpec extends SparkSpec {

  test("1024-node path graph (diameter 1023) converges in O(log n) " +
      "rounds, not O(n), with the correct single component") {
    import spark.implicits._
    val n = 1024
    val nodes = (0L until n.toLong).toDF("doc_id")
    val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1))
      .toDF("doc_a", "doc_b")
    val (labels, iters) =
      graft.operators.DedupOps.connectedComponents(nodes, pairs)
    val lbls = labels.select(col("lbl")).distinct().collect().map(_.getLong(0))
    assert(lbls.toSeq == Seq(0L), "one component labelled by its min")
    // plain propagation needs ~1023 rounds here; path halving must be
    // logarithmic (2*log2(1024) = 20, allow slack for the final
    // no-change confirmation round)
    assert(iters <= 25, s"expected O(log n) rounds, took $iters")
  }

  test("disjoint components + singletons get their own min labels") {
    import spark.implicits._
    val nodes = (0L to 9L).toDF("doc_id")
    // components: {0,1,2}, {3,4}, singletons 5..9
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val (labels, _) =
      graft.operators.DedupOps.connectedComponents(nodes, pairs)
    val m = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L,
      5L -> 5L, 6L -> 6L, 7L -> 7L, 8L -> 8L, 9L -> 9L))
  }
}
