package graft

import org.apache.spark.sql.functions._

/** Round-9 operators: brute-force models computed independently on the
  * driver, compared against the distributed queries (and the m19 audit
  * against the exact banding/hamming definitions it prices).
  */
class Round9OpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("t47 packing sweep matches brute force and the policy algebra " +
      "(loss falls with bin size, fill rises toward 1)") {
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0),
        r.getString(1).trim.split(" ").count(_.nonEmpty).toLong))
    val langs = docs.map(_._1).distinct.sorted
    val bins = Seq(256L, 512L, 1024L, 2048L)
    val got = q("t47_packing_sweep").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("bin_tokens")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("n_docs_truncated"), r.getAs[Long]("tokens_lost"),
          r.getAs[Double]("loss_rate"), r.getAs[Long]("n_bins"),
          r.getAs[Double]("fill_ratio"))).toMap
    assert(got.size === langs.size * bins.size)
    langs.foreach { l =>
      val nts = docs.filter(_._1 == l).map(_._2)
      val total = nts.sum
      bins.foreach { b =>
        val g = got((l, b))
        val lost = nts.map(nt => math.max(0L, nt - b)).sum
        val nBins = (total + b - 1) / b
        assert(g._1 === nts.length.toLong)
        assert(g._2 === total)
        assert(g._3 === nts.count(_ > b).toLong)
        assert(g._4 === lost)
        assert(g._5 === lost.toDouble / total.toDouble)
        assert(g._6 === nBins)
        assert(g._7 === total.toDouble / (nBins * b).toDouble)
      }
      // policy algebra: truncation loss is non-increasing in bin size;
      // stream fill is within one bin of perfect
      val losses = bins.map(b => got((l, b))._4)
      assert(losses.zip(losses.tail).forall { case (a2, b2) => a2 >= b2 })
      bins.foreach(b => assert(got((l, b))._7 > 0.0 &&
        got((l, b))._7 <= 1.0))
    }
  }

  test("t48 vocab sweep matches brute force and coverage is monotone " +
      "in vocab size") {
    val words = Tables.documents(spark, sf)
      .select(col("text")).collect()
      .flatMap(_.getString(0).trim.split(" ").filter(_.nonEmpty))
    val counts = words.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val ranked = counts.toSeq.sortBy { case (w, c) => (-c, w) }
    val total = counts.values.sum
    val got = q("t48_vocab_sweep").collect()
      .map(r => r.getAs[Long]("vocab_size") ->
        (r.getAs[Long]("n_types"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("tokens_covered"),
          r.getAs[Double]("token_coverage"),
          r.getAs[Double]("oov_rate"),
          r.getAs[Double]("type_coverage"))).toMap
    Seq(1024L, 4096L, 16384L).foreach { v =>
      val covered = ranked.take(v.toInt).map(_._2).sum
      val g = got(v)
      assert(g._1 === counts.size.toLong)
      assert(g._2 === total)
      assert(g._3 === covered, s"V=$v")
      assert(g._4 === covered.toDouble / total.toDouble)
      assert(g._5 === 1.0 - covered.toDouble / total.toDouble)
      assert(g._6 ===
        math.min(v, counts.size.toLong).toDouble / counts.size.toDouble)
    }
    val covs = Seq(1024L, 4096L, 16384L).map(v => got(v)._4)
    assert(covs.zip(covs.tail).forall { case (a, b) => a <= b },
      "coverage must be monotone in vocab size")
  }

  test("m19 band tuning matches brute force: candidate cost from " +
      "bucket sizes, found/truth at hamming <= 12") {
    import operators.Multimodal.{MediaIn, MultimodalStub}
    val fps = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => MediaIn(r.getLong(0), r.getString(1).getBytes("UTF-8")))
      .filter(_.payload.nonEmpty)
      .map(MultimodalStub.ahash)
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val truth = (for {
      i <- fps.indices; j <- (i + 1) until fps.length
      if ham(fps(i).ahash, fps(j).ahash) <= 12
    } yield 1).size.toLong
    val got = q("m19_band_tuning").collect()
      .map(r => r.getAs[String]("config") ->
        (r.getAs[Long]("n_candidate_pairs"), r.getAs[Long]("n_hot_buckets"),
          r.getAs[Long]("n_found"), r.getAs[Long]("n_truth"))).toMap
    assert(got.keySet === Set("4x15", "3x20", "2x30"))
    Seq((4, 15), (3, 20), (2, 30)).foreach { case (nb, w) =>
      val mask = (1L << w) - 1
      val buckets = scala.collection.mutable.Map.empty[(Int, Long), Long]
      fps.foreach { f =>
        (0 until nb).foreach { band =>
          val bh = (f.ahash >>> (band * w)) & mask
          buckets((band, bh)) = buckets.getOrElse((band, bh), 0L) + 1L
        }
      }
      val candPairs = buckets.values.map(s => s * (s - 1) / 2).sum
      val hot = buckets.values.count(_ > 1).toLong
      val found = (for {
        i <- fps.indices; j <- (i + 1) until fps.length
        if (0 until nb).exists(band =>
          ((fps(i).ahash >>> (band * w)) & mask) ==
            ((fps(j).ahash >>> (band * w)) & mask))
        if ham(fps(i).ahash, fps(j).ahash) <= 12
      } yield 1).size.toLong
      val g = got(s"${nb}x$w")
      assert(g._1 === candPairs, s"cand $nb x $w")
      assert(g._2 === hot, s"hot $nb x $w")
      assert(g._3 === found, s"found $nb x $w")
      assert(g._4 === truth)
      assert(g._3 <= g._4, "banding can only lose pairs vs truth")
    }
  }
}
