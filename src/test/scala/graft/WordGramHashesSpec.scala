package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Semantics of the codegen'd word n-gram hash expression
  * (graft.functions.WordGramHashes): the hash keys behind the dedup
  * shingle index (d03/d04/d07) and decontamination grams (d08). The
  * contract is `split(trim(text), " ")` word boundaries + one hash per
  * n-gram position; values only need determinism and injectivity-in-
  * practice (collisions bounded, documented at call sites).
  */
class WordGramHashesSpec extends SparkSpec {

  private def hashesOf(text: String, n: Int): Seq[Long] =
    graft.functions.WordGramHashes.hashes(UTF8String.fromString(text), n)
      .toLongArray().toSeq

  test("position count matches split(trim(text), ' ') semantics, " +
      "including empty input, multi-space runs, and trim") {
    // words = regex-split on single spaces, trailing empties kept
    def model(text: String): Seq[String] = text.trim.split(" ", -1).toSeq
    val cases = Seq("a b c d", "  a b  ", "", " ", "a", "a  b", // double space
      "x  ", "a b c d e f g h i j")
    for (t <- cases; n <- 1 to 4) {
      val words = model(t)
      val expected = math.max(words.size - n + 1, 0)
      assert(hashesOf(t, n).size == expected,
        s"text='$t' n=$n words=$words")
    }
  }

  test("equal word sequences hash equal; word-boundary structure is " +
      "part of the key (no concat ambiguity)") {
    // same grams, independent of surrounding context
    val h1 = hashesOf("a b c", 2)
    val h2 = hashesOf("z a b c", 2)
    assert(h1.head == h2(1), "gram 'a b' must hash identically anywhere")
    // "ab c" vs "a bc": same concatenated bytes, different boundaries
    assert(hashesOf("ab c", 2) != hashesOf("a bc", 2))
    // distinct grams distinct in practice on a real vocabulary
    val distinctGrams = hashesOf("q w e r t y u i o p", 3)
    assert(distinctGrams.distinct.size == distinctGrams.size)
  }

  test("DataFrame (codegen) path, SQL registration, and the declarative " +
      "transform/slice form agree") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq("the quick brown fox jumps", "  padded   text  ", "one")
      .toDF("text")
    val viaColumn = df.select(
      graft.functions.TextFunctions.wordGramHashes(col("text"), 3).as("h"))
      .as[Seq[Long]].collect().toSeq
    val viaSql = df.selectExpr("word_ngram_hashes(text, 3) AS h")
      .as[Seq[Long]].collect().toSeq
    val viaHelper = df.as[String].collect().toSeq.map(hashesOf(_, 3))
    assert(viaColumn == viaSql)
    assert(viaColumn == viaHelper)
    // counts match the declarative HOF form this expression replaces
    val declarative = df
      .withColumn("words", split(trim(col("text")), " "))
      .select(expr("CASE WHEN size(words) >= 3 THEN size(words) - 2 " +
        "ELSE 0 END").as("k")).as[Int].collect().toSeq
    assert(viaColumn.map(_.size) == declarative)
  }

  test("t11 repetition-filter arithmetic equals an independent string-" +
      "gram count model on the real corpus (no hash-collision effect, " +
      "no formula drift)") {
    val dir = "/root/testdata/sf0.001"
    val model = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect().map { r =>
        val words = r.getString(1).trim.split(" ", -1).toSeq
        val counts = words.sliding(3).filter(_.size == 3)
          .map(_.mkString(" ")).toSeq.groupBy(identity).map(_._2.size)
        val total = counts.sum
        val dup = counts.filter(_ > 1).sum
        r.getLong(0) -> ((total, dup))
      }.toMap
    val got = SparkEntry.queries("t11_repetition_filter")(spark, dir)
      .collect().map(r =>
        r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(got == model)
  }

  test("repetitionStats: docs with fewer than 3 words (zero gram " +
      "positions) yield zeros instead of throwing — sequence(1, 0) is " +
      "the descending [1, 0], so the guard matters") {
    import spark.implicits._
    val df = Seq((1L, "a b"), (2L, ""), (3L, "x"),
      (4L, "p q r p q r p q")).toDF("doc_id", "text")
    val got = graft.operators.TextOps.repetitionStats(df)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((0, 0, 0.0, false)))
    assert(got(2L) == ((0, 0, 0.0, false)))
    assert(got(3L) == ((0, 0, 0.0, false)))
    // 6 gram positions, every gram occurs twice -> all positions dup
    assert(got(4L) == ((6, 6, 1.0, true)))
  }

  test("t12 chunking invariants on the real corpus: chunks cover every " +
      "token exactly once per 48-stride slot, no chunk is contained in " +
      "its predecessor, adjacent chunks overlap by exactly 16 tokens") {
    val dir = "/root/testdata/sf0.001"
    val lens = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(trim(col("text")), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = SparkEntry.queries("t12_doc_chunking")(spark, dir)
      .select(col("doc_id"), col("chunk_idx"), col("n_chunk_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    for ((doc, rows) <- chunks) {
      val n = lens(doc)
      val sorted = rows.sortBy(_._2)
      // contiguous chunk indexes from 0
      assert(sorted.map(_._2).toSeq ==
        (0L until sorted.length.toLong).toSeq, s"doc $doc")
      for ((_, idx, clen) <- sorted) {
        val start = idx * 48 + 1
        val end = start + clen - 1
        assert(end <= n, s"doc $doc chunk $idx overruns")
        // chunks after the first must reach past the predecessor's end
        if (idx > 0) assert(end > (idx - 1) * 48 + 64,
          s"doc $doc chunk $idx is contained in its predecessor")
      }
      // the last chunk must reach the final token => full coverage
      val (_, lastIdx, lastLen) = sorted.last
      assert(lastIdx * 48 + lastLen == n, s"doc $doc misses tail tokens")
    }
  }

  test("analysis-time validation: non-string input and n < 1 fail " +
      "with a clear error") {
    import spark.implicits._
    val df = Seq(1L).toDF("x")
    val e1 = intercept[Exception] {
      df.select(graft.functions.TextFunctions.wordGramHashes(col("x"), 3))
        .collect()
    }
    assert(e1.getMessage.contains("word_ngram_hashes"), e1.getMessage)
    val df2 = Seq("a b").toDF("text")
    val e2 = intercept[Exception] {
      df2.select(graft.functions.TextFunctions.wordGramHashes(col("text"), 0))
        .collect()
    }
    assert(e2.getMessage.contains("word_ngram_hashes"), e2.getMessage)
  }

  test("MinHashSignature minima are bit-identical to the declarative " +
      "array_min(transform(xxhash64(lit(i), x))) per seed on real " +
      "shingle arrays (the parity that keeps d09's LSH buckets stable)") {
    val n = 8
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(100)
      .select(col("doc_id"), array_distinct(
        graft.functions.TextFunctions.wordGramHashes(col("text"), 3))
        .as("shs"))
      .filter(size(col("shs")) > 0)
    val declarative = (0 until n).map(i =>
      array_min(transform(col("shs"), x => xxhash64(lit(i), x))).as(s"h$i"))
    val both = docs.select(
      (col("doc_id") +:
        graft.functions.TextFunctions.minhashSignature(col("shs"), n)
          .as("sig") +: declarative): _*)
    val mismatches = both.filter(
      (0 until n).map(i => element_at(col("sig"), i + 1) =!= col(s"h$i"))
        .reduce(_ || _)).count()
    assert(mismatches == 0)
    // empty input contract: Long.MaxValue minima (callers filter first)
    import spark.implicits._
    val empty = Seq(Seq.empty[Long]).toDF("shs")
      .select(graft.functions.TextFunctions.minhashSignature(col("shs"), 4)
        .as("sig"))
      .collect()(0).getSeq[Long](0)
    assert(empty == Seq.fill(4)(Long.MaxValue))
    // SQL registration agrees with the Column path
    graft.functions.GraftFunctions.register(spark)
    val viaSql = docs.limit(5)
      .selectExpr("minhash_signature(shs, 8) AS sig")
      .as[Seq[Long]].collect().toSeq
    val viaColumn = docs.limit(5)
      .select(graft.functions.TextFunctions.minhashSignature(col("shs"), 8)
        .as("sig")).as[Seq[Long]].collect().toSeq
    assert(viaSql == viaColumn)
    // analysis-time validation: wrong element type and n out of range
    val e = intercept[Exception] {
      Seq("x").toDF("s")
        .select(graft.functions.TextFunctions.minhashSignature(col("s"), 4))
        .collect()
    }
    assert(e.getMessage.contains("minhash_signature"), e.getMessage)
  }

  test("AffineMinHashSignature minima are bit-identical to the " +
      "declarative array_min(transform((a_i*x + b_i) % P)) family the " +
      "DuckDB oracle spells out (the parity that keeps d18/d23/d27's " +
      "sweep buckets oracle-checkable)") {
    import graft.functions.AffineMinHashSignature.{P31, affineA, affineB}
    val n = 16
    // raw 60-bit md5-prefix fingerprints, as d18 builds them
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(100)
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(1, size(split(trim(text), " +
          "' ')) - 2), i -> CAST(conv(substring(md5(encode(array_join(" +
          "slice(split(trim(text), ' '), i, 3), ' '), 'UTF-8')), 1, 15), " +
          "16, 10) AS BIGINT)))").as("gs"))
      .filter(size(col("gs")) > 0)
    // the declarative form pre-reduces mod P; the expression reduces
    // internally — both paths must agree element-for-element
    val declarative = (0 until n).map(i => expr(
      s"array_min(transform(gs, x -> (${affineA(i)}L * (x % $P31) + " +
        s"${affineB(i)}L) % $P31))").as(s"h$i"))
    val both = docs.select(
      (col("doc_id") +:
        graft.functions.TextFunctions.affineMinhashSignature(col("gs"), n)
          .as("sig") +: declarative): _*)
    val mismatches = both.filter(
      (0 until n).map(i => element_at(col("sig"), i + 1) =!= col(s"h$i"))
        .reduce(_ || _)).count()
    assert(mismatches == 0)
    // pre-reduced inputs give the same signature (reduction idempotent)
    val viaReduced = docs
      .select(col("doc_id"), expr(s"transform(gs, x -> x % $P31)").as("xs"))
      .select(col("doc_id"), graft.functions.TextFunctions
        .affineMinhashSignature(col("xs"), n).as("sig"))
    val viaRaw = docs.select(col("doc_id"), graft.functions.TextFunctions
      .affineMinhashSignature(col("gs"), n).as("sig"))
    assert(viaRaw.exceptAll(viaReduced).count() == 0)
    assert(viaReduced.exceptAll(viaRaw).count() == 0)
    // SQL registration agrees with the Column path
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val viaSql = docs.limit(5)
      .selectExpr("affine_minhash_signature(gs, 16) AS sig")
      .as[Seq[Long]].collect().toSeq
    val viaColumn = viaRaw.limit(5).select(col("sig"))
      .as[Seq[Long]].collect().toSeq
    assert(viaSql == viaColumn)
    // loud contracts: empty array, null element, negative fingerprint
    val eEmpty = intercept[Exception] {
      Seq(Seq.empty[Long]).toDF("gs")
        .select(graft.functions.TextFunctions
          .affineMinhashSignature(col("gs"), 4)).collect()
    }
    assert(eEmpty.getMessage.contains("affine_minhash_signature"),
      eEmpty.getMessage)
    val eNeg = intercept[Exception] {
      Seq(Seq(-1L)).toDF("gs")
        .select(graft.functions.TextFunctions
          .affineMinhashSignature(col("gs"), 4)).collect()
    }
    assert(eNeg.getMessage.contains("negative"), eNeg.getMessage)
    // analysis-time validation: wrong element type
    val eType = intercept[Exception] {
      Seq("x").toDF("s")
        .select(graft.functions.TextFunctions
          .affineMinhashSignature(col("s"), 4)).collect()
    }
    assert(eType.getMessage.contains("affine_minhash_signature"),
      eType.getMessage)
  }
}
