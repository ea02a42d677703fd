package graft

import graft.functions.{PackedTrigrams, QuantileSketchBuffer, TopKBuffer}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (JVM-level, no SparkSession — fast) for the custom
  * primitives: buffer sketches against naive models under random streams
  * and merge trees, trigram packing against the sliding-window model,
  * and — most importantly — the ZERO-RECALL-LOSS theorem behind the
  * PPJoin candidate filters: on random corpora, every pair at
  * Jaccard >= t must survive prefix + length + positional filtering.
  */
class GraftPropertiesSpec extends AnyFunSuite {

  private def forAllSeeded[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  // --- TopKBuffer -------------------------------------------------------

  private val streamGen: Gen[List[(Double, Long)]] =
    Gen.listOf(Gen.zip(Gen.chooseNum(-5.0, 5.0), Gen.chooseNum(0L, 30L)))

  test("TopKBuffer equals naive top-k under random streams and merges") {
    forAllSeeded(Gen.zip(streamGen, streamGen, Gen.chooseNum(1, 6))) {
      case (s1, s2, k) =>
        val direct = new TopKBuffer(k)
        (s1 ++ s2).foreach { case (v, id) => direct.add(v, id) }
        val left = new TopKBuffer(k)
        s1.foreach { case (v, id) => left.add(v, id) }
        val right = new TopKBuffer(k)
        s2.foreach { case (v, id) => right.add(v, id) }
        right.entries.foreach { case (v, id) => left.add(v, id) }
        val model = (s1 ++ s2)
          .sortBy { case (v, id) => (-v, id) }.take(k)
        assert(direct.entries == model)
        assert(left.entries == model, "merge must equal single-stream")
    }
  }

  // --- HLL register file -----------------------------------------------

  test("HLL registers equal the per-bucket max-rho model under random " +
      "streams, any split, and any merge order") {
    import graft.functions.HllRegisterAggregate.{estimate, observe}
    val hashGen = Gen.listOf(Gen.chooseNum(0L, (1L << 60) - 1))
    forAllSeeded(Gen.zip(hashGen, hashGen)) { case (s1, s2) =>
      def model(hs: List[Long]): Seq[Int] =
        (0 until 64).map { b =>
          val rhos = hs.filter(h => (h & 63L) == b.toLong).map { h =>
            val w = h >>> 6
            55 - (64 - java.lang.Long.numberOfLeadingZeros(w))
          }
          if (rhos.isEmpty) 0 else rhos.max
        }
      val direct = new Array[Byte](64)
      (s1 ++ s2).foreach(observe(direct, _))
      val a = new Array[Byte](64)
      s1.reverse.foreach(observe(a, _)) // reversed order must not matter
      val b = new Array[Byte](64)
      s2.foreach(observe(b, _))
      // merge b into a element-wise (the aggregate's merge)
      (0 until 64).foreach(i => if (b(i) > a(i)) a(i) = b(i))
      val m = model(s1 ++ s2)
      assert(direct.map(_.toInt).toSeq == m)
      assert(a.map(_.toInt).toSeq == m, "split+merge must equal direct")
      // estimate is a pure function of the registers
      assert(estimate(direct) == estimate(a))
    }
    // negative hash throws loudly
    val e = intercept[IllegalArgumentException] {
      observe(new Array[Byte](64), -1L)
    }
    assert(e.getMessage.contains("negative"))
  }

  // --- Count-Min counter matrix ----------------------------------------

  test("CMS counters equal the per-slice count model under random " +
      "streams, any split, and any merge order; the estimate never " +
      "undercounts") {
    import graft.functions.CmsSketchAggregate.{estimate, observe}
    val hashGen = Gen.listOf(Gen.chooseNum(0L, (1L << 60) - 1))
    forAllSeeded(Gen.zip(hashGen, hashGen)) { case (s1, s2) =>
      val all = s1 ++ s2
      def model: Seq[Long] =
        (0 until 4).flatMap { i =>
          (0 until 64).map { idx =>
            all.count(h => ((h >>> (6 * i)) & 63L) == idx.toLong).toLong
          }
        }
      val direct = new Array[Long](256)
      all.foreach(observe(direct, _, 4, 6))
      val a = new Array[Long](256)
      s1.reverse.foreach(observe(a, _, 4, 6))
      val b = new Array[Long](256)
      s2.foreach(observe(b, _, 4, 6))
      (0 until 256).foreach(i => a(i) += b(i)) // the aggregate's merge
      assert(direct.toSeq == model)
      assert(a.toSeq == model, "split+merge must equal direct")
      // one-sided error: the probe never undercounts any key's count
      all.distinct.foreach { h =>
        val truth = all.count(_ == h).toLong
        assert(estimate(direct, h, 4, 6) >= truth, s"h=$h")
      }
    }
    val e = intercept[IllegalArgumentException] {
      observe(new Array[Long](256), -1L, 4, 6)
    }
    assert(e.getMessage.contains("negative"))
  }

  // --- Exact-distinct bitmap -------------------------------------------

  test("BitmapBuffer equals the Set model under random adds, any " +
      "split + OR merge, and serializes equal SETS identically " +
      "regardless of insertion order and growth history") {
    import graft.functions.BitmapBuffer
    val keyGen = Gen.listOf(Gen.oneOf(Gen.chooseNum(0L, 63L),
      Gen.chooseNum(0L, 5000L), Gen.chooseNum(90000L, 100000L)))
    forAllSeeded(Gen.zip(keyGen, keyGen)) { case (s1, s2) =>
      val all = (s1 ++ s2).toSet
      val direct = new BitmapBuffer()
      (s1 ++ s2).foreach(direct.add)
      val a = new BitmapBuffer()
      s1.reverse.foreach(a.add)
      val b = new BitmapBuffer()
      s2.foreach(b.add)
      a.orWith(b)
      assert(java.util.Arrays.equals(direct.bytes, a.bytes),
        "equal sets must serialize identically")
      assert(BitmapBuffer.count(direct.bytes) == all.size.toLong)
      val s1Set = s1.toSet
      val aOnly = new BitmapBuffer()
      s1.foreach(aOnly.add)
      assert(BitmapBuffer.andCount(aOnly.bytes, b.bytes) ==
        (s1Set & s2.toSet).size.toLong)
      // round trip through the serialized form
      val rt = BitmapBuffer.fromBytes(direct.bytes)
      rt.add(100000L)
      assert(BitmapBuffer.count(rt.bytes) ==
        (all + 100000L).size.toLong)
    }
    val e = intercept[IllegalArgumentException] {
      new BitmapBuffer().add(BitmapBuffer.MaxKey + 1)
    }
    assert(e.getMessage.contains("hll_register_agg"))
  }

  // --- QuantileSketchBuffer --------------------------------------------

  test("QuantileSketchBuffer is the bottom-k DISTINCT (hash, value) set, " +
      "independent of order and merge tree") {
    val pairGen = Gen.listOf(Gen.zip(Gen.chooseNum(0L, 50L), Gen.chooseNum(0L, 9L)))
    forAllSeeded(Gen.zip(pairGen, pairGen, Gen.chooseNum(1, 8))) {
      case (s1, s2, k) =>
        val direct = new QuantileSketchBuffer(k)
        (s1 ++ s2).foreach { case (h, v) => direct.add(h, v) }
        val a = new QuantileSketchBuffer(k)
        s1.reverse.foreach { case (h, v) => a.add(h, v) }
        val b = new QuantileSketchBuffer(k)
        s2.foreach { case (h, v) => b.add(h, v) }
        b.entries.foreach { case (h, v) => a.add(h, v) }
        val model = (s1 ++ s2).distinct.sorted.take(k)
        assert(direct.entries.toList == model)
        assert(a.entries.toList == model,
          "reversed + merged must equal single-pass")
    }
  }

  // --- PackedTrigrams ---------------------------------------------------

  test("PackedTrigrams.pack equals the sliding-window model and " +
      "unpack inverts it, over random unicode strings") {
    val cpGen = Gen.frequency(
      8 -> Gen.chooseNum(32, 126),
      2 -> Gen.chooseNum(0x80, 0x2FFF),
      1 -> Gen.chooseNum(0x10000, 0x10FFF)) // supplementary plane
    val strGen = Gen.listOf(cpGen).map(cps =>
      new String(cps.toArray, 0, cps.length))
    forAllSeeded(strGen) { s =>
      val packed = PackedTrigrams.pack(UTF8String.fromString(s))
      val cps = s.codePoints().toArray
      val model = cps.sliding(3).filter(_.length == 3)
        .map(w => new String(w, 0, 3)).toList
      val got = (0 until packed.numElements())
        .map(i => PackedTrigrams.unpack(packed.getLong(i))).toList
      assert(got == model)
    }
  }

  // --- PPJoin filter recall --------------------------------------------

  /** Model of DedupOps.prefixCandidates' pruning rules on an explicit
    * corpus: returns the candidate pairs the filters admit. */
  private def candidateModel(corpus: Vector[Set[Int]], t: Double)
      : Set[(Int, Int)] = {
    val df = corpus.flatMap(_.toSeq).groupBy(identity).map {
      case (sh, occ) => sh -> occ.size
    }
    // global rarest-first total order: (df asc, shingle asc)
    val sorted = corpus.map(s =>
      s.toVector.sortBy(sh => (df(sh), sh)))
    val prefixes = sorted.map { l =>
      val keep = l.size - math.ceil(t * l.size).toInt + 1
      l.take(keep).zipWithIndex // (shingle, 0-based position)
        .filter { case (sh, _) => df(sh) >= 2 }
    }
    val out = scala.collection.mutable.Set.empty[(Int, Int)]
    for {
      i <- corpus.indices; j <- corpus.indices if i < j
      (sh, pi) <- prefixes(i)
      pj <- prefixes(j).collectFirst { case (`sh`, p) => p }
    } {
      val (sa, sb) = (corpus(i).size, corpus(j).size)
      val lengthOk = math.min(sa, sb).toDouble >= t * math.max(sa, sb)
      val bound = 1 + math.min(sa - (pi + 1), sb - (pj + 1))
      val needed = math.ceil(t / (1 + t) * (sa + sb))
      if (lengthOk && bound >= needed) out += ((i, j))
    }
    out.toSet
  }

  test("PPJoin prefix + length + positional filters never drop a pair " +
      "with Jaccard >= t (zero recall loss on random corpora)") {
    val setGen = Gen.chooseNum(3, 20).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 40)).map(_.toSet))
    val corpusGen = Gen.chooseNum(4, 15).flatMap(n =>
      Gen.listOfN(n, setGen).map(_.toVector))
    val tGen = Gen.oneOf(0.5, 0.7, 0.8, 0.9)
    var qualifying = 0
    forAllSeeded(Gen.zip(corpusGen, tGen), n = 300) { case (corpus, t) =>
      val cands = candidateModel(corpus, t)
      for (i <- corpus.indices; j <- corpus.indices if i < j) {
        val inter = (corpus(i) & corpus(j)).size
        val un = (corpus(i) | corpus(j)).size
        if (un > 0 && inter.toDouble / un >= t) {
          qualifying += 1
          assert(cands.contains((i, j)),
            s"pair ($i,$j) J=${inter.toDouble / un} >= $t dropped; " +
              s"corpus=$corpus")
        }
      }
    }
    assert(qualifying > 50, s"property under-exercised: $qualifying pairs")
  }

  /** Scala model of [[graft.operators.DedupOps.containmentPairs]]'s
    * candidate filters — A-side prefix, size, positional — including
    * the 1e-9 ceiling guard (0.9*10 = 9.000000000000002 must not
    * tighten a bound). */
  private def containmentModel(corpus: Vector[Set[Int]], t: Double)
      : Set[(Int, Int)] = {
    val df = corpus.flatMap(_.toSeq).groupBy(identity).map {
      case (sh, occ) => sh -> occ.size
    }
    def ceilT(sa: Int): Double = math.ceil(t * sa - 1e-9)
    val sorted = corpus.map(s => s.toVector.sortBy(sh => (df(sh), sh)))
    val prefixes = sorted.map { l =>
      val keep = l.size - math.ceil(t * l.size - 1e-9).toInt + 1
      l.take(keep).zipWithIndex.filter { case (sh, _) => df(sh) >= 2 }
    }
    val fulls = sorted.map(
      _.zipWithIndex.filter { case (sh, _) => df(sh) >= 2 })
    val out = scala.collection.mutable.Set.empty[(Int, Int)]
    for {
      a <- corpus.indices; b <- corpus.indices if a != b
      (sh, pa) <- prefixes(a)
      pb <- fulls(b).collectFirst { case (`sh`, p) => p }
    } {
      val (sa, sb) = (corpus(a).size, corpus(b).size)
      val bound = 1 + math.min(sa - (pa + 1), sb - (pb + 1))
      if (sb >= ceilT(sa) && bound >= ceilT(sa)) out += ((a, b))
    }
    out.toSet
  }

  test("containment A-prefix + size + positional filters never drop a " +
      "directional pair with C(A→B) >= t (zero recall loss)") {
    val setGen = Gen.chooseNum(3, 20).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 40)).map(_.toSet))
    val corpusGen = Gen.chooseNum(4, 15).flatMap(n =>
      Gen.listOfN(n, setGen).map(_.toVector))
    val tGen = Gen.oneOf(0.7, 0.8, 0.9)
    var qualifying = 0
    forAllSeeded(Gen.zip(corpusGen, tGen), n = 300) { case (corpus, t) =>
      val cands = containmentModel(corpus, t)
      for (a <- corpus.indices; b <- corpus.indices if a != b) {
        val sa = corpus(a).size
        val inter = (corpus(a) & corpus(b)).size
        if (sa > 0 && inter.toDouble / sa >= t) {
          qualifying += 1
          assert(cands.contains((a, b)),
            s"pair ($a,$b) C=${inter.toDouble / sa} >= $t dropped; " +
              s"corpus=$corpus")
        }
      }
    }
    assert(qualifying > 50, s"property under-exercised: $qualifying pairs")
  }

  // --- KPL AggregatedRecord codec --------------------------------------

  private val subRecordGen: Gen[graft.sources.SubRecord] = for {
    pk <- Gen.chooseNum(0, 6).map(i => s"pk-$i") // force interning reuse
    data <- Gen.listOf(Gen.chooseNum(0, 255).map(_.toByte)).map(_.toArray)
    ehk <- Gen.option(Gen.chooseNum(0, 3).map(i => s"1${"0" * i}"))
    tags <- Gen.listOfN(2, Gen.zip(
      Gen.oneOf("source", "tier", "λkey"),
      Gen.option(Gen.oneOf("", "v", "ünïcode"))))
      .flatMap(ts => Gen.chooseNum(0, 2).map(ts.take))
  } yield graft.sources.SubRecord(pk, data, ehk, tags)

  test("KPL aggregate/deaggregate round-trips random sub-records with " +
      "EHKs and tags (interned tables, unicode, empty payloads/values)") {
    import graft.transport.KplAggregation
    forAllSeeded(Gen.nonEmptyListOf(subRecordGen), n = 300) { subs =>
      val out = KplAggregation.tryDeaggregate(KplAggregation.aggregate(subs))
      assert(out.isDefined, "own encoding must deaggregate")
      assert(out.get.size == subs.size)
      out.get.zip(subs).foreach { case (got, want) =>
        assert(got.partitionKey == want.partitionKey)
        assert(java.util.Arrays.equals(got.data, want.data))
        assert(got.explicitHashKey == want.explicitHashKey)
        assert(got.tags == want.tags)
      }
    }
  }

  test("KPL decoder never crashes on random protobuf bodies carried " +
      "under a VALID magic + MD5 envelope (the checksum gate bypassed, " +
      "so the wire reader itself faces the fuzz): every outcome is " +
      "Some(wellformed) or the plain-record fallback") {
    import graft.transport.KplAggregation
    val junk = Gen.listOf(Gen.chooseNum(0, 255).map(_.toByte)).map(_.toArray)
    forAllSeeded(junk, n = 500) { body =>
      val md5 = java.security.MessageDigest.getInstance("MD5").digest(body)
      val prefixed = KplAggregation.Magic ++ body ++ md5
      KplAggregation.tryDeaggregate(prefixed) match {
        case None => () // malformed protobuf -> plain-record fallback
        case Some(subs) => // parsed: structure must be fully resolved
          assert(subs.nonEmpty)
          subs.foreach { s =>
            assert(s.partitionKey != null && s.data != null)
          }
      }
    }
  }
}
