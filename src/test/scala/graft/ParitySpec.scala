package graft

import org.apache.spark.sql.functions._

/** Pins the oracle-parity arithmetic: the scaled-long fast path
  * ([[Parity.scaledSum]]/[[Parity.scaledAvg]]) must be bit-identical to
  * the per-row decimal path ([[Parity.dsum]]/[[Parity.davg]]) — they are
  * interchangeable implementations of the same exact rational sum, so
  * any divergence is a bug in the scaling, the division scale, or the
  * final rounding.
  */
class ParitySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("scaledSum/scaledAvg are bit-identical to dsum/davg on real " +
      "2dp measures incl. 3-factor products (TPC-H Q1 shapes)") {
    import Parity._
    val l = Tables.lineitem(spark, dir)
    val qc = cents2(col("l_quantity"))
    val epc = cents2(col("l_extendedprice"))
    val dc = cents2(col("l_discount"))
    val tc = cents2(col("l_tax"))
    val rows = l.groupBy(col("l_returnflag"))
      .agg(
        scaledSum(qc, 2).as("s_fast"),
        dsum(col("l_quantity")).as("s_slow"),
        scaledSum(epc * (lit(100L) - dc), 4).as("dp_fast"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("dp_slow"),
        scaledSum(epc * (lit(100L) - dc) * (lit(100L) + tc), 6)
          .as("ch_fast"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("ch_slow"),
        scaledAvg(epc, 2).as("a_fast"),
        davg(col("l_extendedprice")).as("a_slow"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      for (i <- Seq(1, 3, 5, 7)) {
        val fast = r.getDouble(i)
        val slow = r.getDouble(i + 1)
        assert(java.lang.Double.doubleToLongBits(fast) ==
          java.lang.Double.doubleToLongBits(slow),
          s"column pair ${r.schema(i).name}/${r.schema(i + 1).name}: " +
            s"$fast != $slow")
      }
    }
  }

  test("scaledSum handles negative values and partition-order " +
      "independence (repartitioned sum equals single-partition sum)") {
    import Parity._
    import spark.implicits._
    val vals = (1 to 10001).map(i =>
      (if (i % 2 == 0) 1 else -1) * (i * 0.01 + 0.07))
    val df = vals.toDF("x")
    def total(parts: Int): Double =
      df.repartition(parts).agg(scaledSum(cents2(col("x")), 2)).head.getDouble(0)
    val one = total(1)
    assert(java.lang.Double.doubleToLongBits(one) ==
      java.lang.Double.doubleToLongBits(total(7)))
    // cross-check against the decimal path too
    val dec = df.agg(dsum(col("x"))).head.getDouble(0)
    assert(java.lang.Double.doubleToLongBits(one) ==
      java.lang.Double.doubleToLongBits(dec))
  }

  test("scaledSum raises on long-accumulator overflow instead of " +
      "silently wrapping when ANSI is off") {
    import Parity._
    import spark.implicits._
    val ansiBefore = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      // two rows near Long.MaxValue: the long sum wraps negative, the
      // double shadow tracks ~1.8e19 — guard must fire, never return
      // the wrapped value
      val df = Seq(Long.MaxValue - 10L, Long.MaxValue - 10L).toDF("x")
      val e = intercept[Exception] {
        df.agg(scaledSum(col("x"), 2)).head
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("overflow")), e.toString)
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiBefore)
  }

  test("scaledSum raises on overflow under ANSI too (engine overflow " +
      "error — never a silent wrap in either mode)") {
    import Parity._
    import spark.implicits._
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val df = Seq(Long.MaxValue - 10L, Long.MaxValue - 10L).toDF("x")
    val e = intercept[Exception] {
      df.agg(scaledSum(col("x"), 2)).head
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m =>
      m.toLowerCase.contains("overflow") || m.contains("ARITHMETIC")),
      e.toString)
  }

  test("scaledSum of an empty input is null, not an overflow error") {
    import Parity._
    import spark.implicits._
    val df = Seq.empty[Long].toDF("x")
    assert(df.agg(scaledSum(col("x"), 2)).head.isNullAt(0))
  }
}
