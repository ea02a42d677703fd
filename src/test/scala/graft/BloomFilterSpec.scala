package graft

import graft.functions.{BloomBits, BloomBuffer, BloomFunctions}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction (q67's machinery): the
  * no-false-negative contract, merge-as-union, false-positive-rate
  * sanity, SQL registration, and the end-to-end equality of the
  * bloom-prefiltered plan with the plain exact semi join. */
class BloomFilterSpec extends SparkSpec {

  test("no false negatives: every inserted key probes true, across " +
      "random key sets and filter geometries") {
    val rnd = new scala.util.Random(3)
    (0 until 20).foreach { _ =>
      val bits = 64 << rnd.nextInt(8)
      val hashes = 1 + rnd.nextInt(8)
      val keys = Array.fill(1 + rnd.nextInt(200))(rnd.nextLong())
      val buf = new BloomBuffer(bits, hashes)
      keys.foreach(buf.add)
      keys.foreach(k => assert(buf.mightContain(k),
        s"false negative for $k at bits=$bits hashes=$hashes"))
      // probing the SERIALIZED bytes is the same filter
      keys.foreach(k => assert(BloomBits.mightContain(buf.bytes, k)))
    }
  }

  test("merge is union (and refuses mismatched geometry)") {
    val a = new BloomBuffer(1 << 12, 5)
    val b = new BloomBuffer(1 << 12, 5)
    (0L until 300L).foreach(a.add)
    (300L until 600L).foreach(b.add)
    a.merge(b)
    (0L until 600L).foreach(k => assert(a.mightContain(k)))
    val wrong = new BloomBuffer(1 << 13, 5)
    intercept[IllegalArgumentException](a.merge(wrong))
  }

  test("false-positive rate at the q67 geometry (2^19 bits, 5 hashes) " +
      "stays under 1% at the sf0.1 build-side count (~30k keys) — an " +
      "undersized filter (2^16) saturates at that count") {
    val buf = new BloomBuffer(1 << 19, 5)
    (0L until 30000L).foreach(k => buf.add(k * 7919L))
    val probes = (0 until 20000).map(i => 1000000000L + i)
    val fp = probes.count(buf.mightContain)
    assert(fp < 200, s"fpr ${fp / 20000.0} >= 1%")
    // the saturation counter-example the sizing comment warns about
    val small = new BloomBuffer(1 << 16, 5)
    (0L until 30000L).foreach(k => small.add(k * 7919L))
    val fpSmall = probes.count(small.mightContain)
    assert(fpSmall > 8000,
      s"expected a saturated 2^16 filter at 30k keys (got $fpSmall/20000)")
  }

  test("SQL surface: graft_bloom_agg + graft_bloom_contains pre-filter " +
      "plus exact semi join equals the plain semi join, and the " +
      "pre-filter really discards rows before the join") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val keys = (0L until 50L).map(k => k * 3L).toDF("k") // build: multiples of 3
    val probe = (0L until 600L).toDF("p")
    keys.createOrReplaceTempView("bloom_build")
    probe.createOrReplaceTempView("bloom_probe")
    val bloomed = spark.sql(
      """SELECT p FROM bloom_probe
         CROSS JOIN (SELECT graft_bloom_agg(k, 4096, 5) AS bf
                     FROM bloom_build)
         WHERE graft_bloom_contains(bf, p)""")
    val preCount = bloomed.count()
    val exact = bloomed.join(keys, bloomed("p") === keys("k"), "left_semi")
      .orderBy("p").as[Long].collect()
    assert(exact.toSeq == (0L until 50L).map(_ * 3L),
      "bloom pre-filter + exact semi join must equal the plain semi join")
    assert(preCount < 600 && preCount >= 50,
      s"pre-filter should discard most non-joining rows (kept $preCount/600)")
  }

  test("analysis rejects non-BIGINT keys and bad geometry with a clear " +
      "message") {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("s", "k")
    val e1 = intercept[Exception](
      df.agg(BloomFunctions.bloomAgg(col("s"), 1 << 12, 5)).collect())
    assert(e1.getMessage.contains("key must be BIGINT"))
    val e2 = intercept[Exception](
      df.agg(BloomFunctions.bloomAgg(col("k"), 4, 5)).collect())
    assert(e2.getMessage.contains("numBits"))
    val e3 = intercept[Exception](
      df.select(BloomFunctions.bloomContains(col("s"), col("k"))).collect())
    assert(e3.getMessage.contains("expected (BINARY bloom, BIGINT key)"))
  }
}
