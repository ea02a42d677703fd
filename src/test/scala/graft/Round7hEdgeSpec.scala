package graft

import org.apache.spark.sql.functions._

/** Structural robustness of the series tests (q159 Pettitt, q160
  * runs, q162 Mann–Kendall): the TPC-H corpus is stationary, so its
  * oracle rows exercise only the "no signal" branch. This spec runs
  * the SAME queries on synthetic mini-corpora with opposite structure
  * — a monotone trend (every statistic must fire) and heavy-tie data
  * (the tie-correction terms must match brute force) — by writing
  * minimal-column parquet fixtures and pointing the queries at them.
  * Degenerate groups (constant series, single observation) are
  * outside the declared contract, as with the rest of the grid
  * algebra: the gate corpus never produces them and the statistics
  * are undefined there.
  */
class Round7hEdgeSpec extends SparkSpec {

  /** Writes a minimal star fixture: one nation, one customer, one
    * order per (week, idx) with the given revenue dollars, one
    * lineitem per order. Returns the fixture dir. */
  private def writeFixture(name: String,
      weekly: Seq[(Int, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft-edge-$name").toString
    weekly.zipWithIndex.map { case ((week, price), i) =>
      (i.toLong, price)
    }.toDF("l_orderkey", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    weekly.zipWithIndex.map { case ((week, _), i) =>
      (i.toLong, 1L, java.sql.Date.valueOf(
        java.time.LocalDate.of(1992, 1, 1).plusDays(7L * week)))
    }.toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, "EDGELAND")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    dir
  }

  private def q(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  test("monotone weekly trend: Mann-Kendall S = C(n,2) with z " +
      "rejecting upward, Pettitt rejects with the changepoint at " +
      "mid-series, and the runs test sees exactly 2 runs") {
    // strictly increasing weekly revenue, one order per week
    val weekly = (0 until 40).map(w => (w, 1000.0 + 100.0 * w))
    val dir = writeFixture("mono", weekly)
    val n = 40L

    val mk = q("q162_mann_kendall", dir).collect()
    assert(mk.length == 1)
    assert(mk.head.getAs[Long]("s_stat") == n * (n - 1) / 2,
      "every pair concordant")
    assert(mk.head.getAs[Boolean]("reject_95") &&
      mk.head.getAs[Double]("z") > 0)

    val pt = q("q159_pettitt_changepoint", dir).collect()
    assert(pt.length == 1)
    assert(pt.head.getAs[Boolean]("reject_95"), "monotone shift is real")
    // for a strict trend |U_t| peaks at the middle: K = max 2t(n-t)/2
    // with ranks = positions, U_t = t(t+1) - t(n+1) ... brute force:
    val ranks = (1 to 40).map(_.toLong) // sorted = identity
    var s2 = 0L; var k = 0L; var arg = -1L
    for (t <- 1 until 40) {
      s2 += 2L * ranks(t - 1)
      val u = math.abs(s2 - t * (n + 1))
      if (u > k) { k = u; arg = (t - 1).toLong }
    }
    assert(pt.head.getAs[Long]("k_stat") == k)
    assert(pt.head.getAs[Long]("cp_week") == arg)

    val rt = q("q160_runs_test", dir).collect()
    assert(rt.length == 1)
    // below-median block then above-median block: exactly 2 runs
    assert(rt.head.getAs[Long]("runs") == 2L)
    assert(rt.head.getAs[Boolean]("reject_95") &&
      rt.head.getAs[Double]("z") < 0, "too FEW runs (clustering)")
  }

  test("heavy-tie data: Mann-Kendall tie-corrected variance and the " +
      "runs-test median-tie exclusion match brute force computed " +
      "directly on the fixture values") {
    // deterministic pseudo-random values from {100, 200, 300}
    val vals = (0 until 60).map(w =>
      (w, 100.0 * (1 + (w * 2654435761L % 97 % 3))))
    val dir = writeFixture("ties", vals)
    val ys = vals.map(v => math.round(v._2)) // exact dollars

    val mk = q("q162_mann_kendall", dir).collect().head
    var s = 0L
    for (i <- ys.indices; j <- (i + 1) until ys.length)
      s += java.lang.Long.signum(ys(j) - ys(i)).toLong
    val n = ys.length.toLong
    val tie = ys.groupBy(identity).values.map(_.length.toLong)
      .map(c => c * (c - 1) * (2 * c + 5)).sum
    val varS = (n * (n - 1) * (2 * n + 5) - tie).toDouble / 18.0
    assert(mk.getAs[Long]("s_stat") == s)
    assert(mk.getAs[Double]("var_s") == varS,
      "tie cubic must subtract exactly")

    val rt = q("q160_runs_test", dir).collect().head
    val sorted = ys.sorted
    val med = sorted(sorted.indices.find(i =>
      2L * (i + 1) >= n).get)
    val signs = ys.filter(_ != med).map(_ > med)
    val runs = 1L + signs.zip(signs.tail).count { case (a, b) => a != b }
    assert(rt.getAs[Long]("runs") == runs)
    assert(rt.getAs[Long]("n_above") == signs.count(identity).toLong)
    assert(rt.getAs[Long]("n_below") ==
      (signs.length - signs.count(identity)).toLong,
      "median ties excluded from both counts")
  }
}
