package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the [[operators.Packing]] scale machinery to the single-task
  * reference semantics it replaces: `orderedPrefixSum`'s (cum, rnk)
  * must equal a global window's running sum / row_number under any
  * input partitioning, and `ntileFromRank`'s closed-form bucket rule
  * must equal the engine's NTILE for every (n, k) shape — including
  * the ragged cases where the first n % k buckets carry one extra row.
  */
class PackingSpec extends SparkSpec {

  test("orderedPrefixSum (cum, rnk) equals the single-partition global " +
      "window reference on a shuffled frame") {
    import spark.implicits._
    // values with heavy ties so the tiebreak column does real work
    val data = (1L to 500L).map(i => (i, (i * 7919) % 23))
      .toDF("id", "v").repartition(7) // scrambled input partitioning
    val got = operators.Packing
      .orderedPrefixSum(data, Seq(col("v").desc, col("id")), "v")
      .select(col("id"), col("cum"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val w = Window.orderBy(col("v").desc, col("id"))
    val ref = data
      .withColumn("cum", sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("id"), col("cum"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.sameElements(ref))
  }

  test("ntileFromRank equals the engine's NTILE for every (n, k) shape " +
      "incl. ragged buckets and n < k") {
    import spark.implicits._
    for (n <- Seq(1, 2, 3, 5, 7, 10, 11, 12, 99, 100, 101);
         k <- Seq(1, 2, 3, 5, 7, 10)) {
      val df = (1L to n.toLong).toDF("r")
      val got = df.select(col("r"),
          operators.Packing.ntileFromRank(col("r"), lit(n.toLong), k)
            .as("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val ref = df.select(col("r"),
          ntile(k).over(Window.orderBy(col("r"))).cast("long").as("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(got.sameElements(ref), s"n=$n k=$k: ${got.toSeq.take(15)} " +
        s"vs ${ref.toSeq.take(15)}")
    }
  }
}
