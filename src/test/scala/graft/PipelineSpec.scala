package graft

import org.apache.spark.sql.functions._

/** End-to-end behavior of the composed training-data pipeline
  * (graft.operators.Pipeline): each stage against a hand-computed
  * model, then the full composition.
  */
class PipelineSpec extends SparkSpec {
  import graft.operators.Pipeline

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog today ok"),
      (2L, "short doc"), // < 10 tokens -> quality-dropped
      (3L, "a a a a a a a a a a b"), // repetitive -> quality-dropped
      (4L, "the quick brown fox jumps over the lazy dog today ok"), // dup of 1
      (5L, "completely different words forming another document body right here now"),
      (6L, "eval overlap gram one two three four five six seven eight nine")
    ).toDF("doc_id", "text")
  }

  test("qualityFilter drops short and repetitive docs, keeps the rest") {
    import spark.implicits._
    val kept = Pipeline.qualityFilter(corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L, 6L))
  }

  test("dedupExact keeps each content group's smallest doc_id") {
    import spark.implicits._
    val kept = Pipeline.dedupExact(corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L, 5L, 6L))
  }

  test("dedupNear keeps one representative per near-dup cluster and " +
      "leaves singletons untouched") {
    import spark.implicits._
    // 12-word docs differing only in the last word: 10 shingles each,
    // 9 shared -> Jaccard 9/11 ~ 0.818 >= 0.8
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"
    val docs = Seq(
      (1L, s"$base endA"),
      (2L, s"$base endB"), // near-dup of 1
      (3L, s"$base endC"), // near-dup of 1 and 2 -> one cluster {1,2,3}
      (4L, "entirely different words without any shared shingles at all x y")
    ).toDF("doc_id", "text")
    val kept = graft.operators.Pipeline.dedupNear(docs, 0.8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L))
  }

  test("decontaminated drops docs sharing an n-gram with the eval set") {
    import spark.implicits._
    val eval = Seq(
      (100L, "gram one two three four five six seven eight nine extra"))
      .toDF("doc_id", "text")
    val kept = Pipeline.decontaminated(corpus, eval, n = 8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("prepare composes quality -> exact dedup -> decontamination and " +
      "emits token counts for the packing stage") {
    import spark.implicits._
    val eval = Seq(
      (100L, "gram one two three four five six seven eight nine extra"))
      .toDF("doc_id", "text")
    val out = Pipeline.prepare(corpus, eval)
    val got = out.select("doc_id", "n_tokens").as[(Long, Int)]
      .collect().toMap
    // 2,3 quality-dropped; 4 dup of 1; 6 contaminated -> {1, 5} survive
    assert(got == Map(1L -> 11, 5L -> 10))
  }

  test("prepare with boilerplateChunk strips repeated chunks FIRST and " +
      "equals prepare over a naively pre-cleaned corpus (metadata " +
      "columns ride through)") {
    import spark.implicits._
    val cw = 4
    val boiler = "subscribe banner chrome footer" // one cw-word chunk
    val docs = Seq(
      (1L, s"$boiler alpha body words here live original thinking prose flows onward daily still", "src0"),
      (2L, s"$boiler beta content body here again fresh original material text keeps moving along", "src1"),
      (3L, "organic document with plenty of original words to pass quality", "src0"),
      (4L, boiler, "src1") // pure chrome -> dropped by the strip
    ).toDF("doc_id", "text", "source")
    val evalDocs = Seq((9L, "nothing shared with anything at all kept clean"))
      .toDF("doc_id", "text")
    // naive model of the strip
    def strip(t: String): String =
      t.split(" ").grouped(cw).map(_.mkString(" "))
        .filterNot(_ == boiler).mkString(" ")
    val precleaned = docs.as[(Long, String, String)].collect().toSeq
      .map { case (id, t, src) => (id, strip(t), src) }
      .filter(_._2.nonEmpty)
      .toDF("doc_id", "text", "source")
    val got = Pipeline.prepare(docs, evalDocs,
        boilerplateChunk = Some(cw))
      .select("doc_id", "source", "n_tokens")
      .as[(Long, String, Int)].collect().toSet
    val expected = Pipeline.prepare(precleaned, evalDocs)
      .select("doc_id", "source", "n_tokens")
      .as[(Long, String, Int)].collect().toSet
    assert(got == expected, s"got=$got expected=$expected")
    assert(got.map(_._1) == Set(1L, 2L, 3L),
      s"stripped docs 1/2 must pass quality with chrome removed: $got")
  }

  test("passageDeduped keeps the FIRST occurrence of a repeated chunk " +
      "(boilerplateStripped would remove all), drops fully-excised " +
      "docs, and metadata columns ride through") {
    import spark.implicits._
    val cw = 4
    val passage = "shared syndicated article text" // one cw-word chunk
    val docs = Seq(
      (1L, s"$passage alpha body words here", "src0"),
      (2L, s"$passage beta content body here", "src1"), // loses chunk 0
      (3L, passage, "src0") // every chunk a later dup -> dropped
    ).toDF("doc_id", "text", "source")
    val got = graft.operators.Pipeline.passageDeduped(docs, cw)
      .select("doc_id", "text", "source")
      .as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (1L, s"$passage alpha body words here", "src0"),
      (2L, "beta content body here", "src1")), got.toString)
  }

  test("leakageSafeSplit: docs sharing a representative always land in " +
      "the same split; cuts validate; near-dup reps plug in directly") {
    import spark.implicits._
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"
    val docs = Seq(
      (1L, s"$base endA"), (2L, s"$base endB"), (3L, s"$base endC"),
      (4L, "entirely different words without any shared shingles at all x y")
    ).toDF("doc_id", "text")
    val reps = graft.operators.DedupOps.nearDupComponents(docs, 0.8)
      .withColumnRenamed("cluster_rep", "rep")
    val out = graft.operators.Pipeline.leakageSafeSplit(docs, reps,
      Seq(("train", 90), ("val", 95), ("test", 100)))
    val rows = out.select("doc_id", "rep", "split")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 4)
    // cluster {1,2,3} shares rep 1 -> identical split for all three
    val clusterSplits = rows.filter(_._2 == 1L).map(_._3).distinct
    assert(rows.count(_._2 == 1L) == 3 && clusterSplits.length == 1)
    val e = intercept[IllegalArgumentException] {
      graft.operators.Pipeline.leakageSafeSplit(docs, reps,
        Seq(("train", 90), ("val", 80)))
    }
    assert(e.getMessage.contains("cuts"))
  }

  test("t15: split is a pure function of the representative's bucket " +
      "and no group straddles splits on the real corpus") {
    val out = SparkEntry.queries("t15_leakage_safe_split")(
      spark, "/root/testdata/sf0.001").cache()
    val perRep = out.groupBy(col("rep"))
      .agg(countDistinct(col("split")).as("n_splits"))
    assert(perRep.filter(col("n_splits") > 1).count() == 0)
    // split must equal the declared bucket thresholds row-by-row
    val bad = out.filter(
      col("split") =!= when(col("bucket") < 90, "train")
        .when(col("bucket") < 95, "val").otherwise("test")).count()
    assert(bad == 0)
    // every doc is assigned exactly once
    assert(out.count() ==
      Tables.documents(spark, "/root/testdata/sf0.001").count())
    out.unpersist()
  }

  test("materialization strategy is semantics-free: prepare and " +
      "sequencePacking emit identical output under localCheckpoint (the " +
      "default), persist, and reliable checkpoint") {
    import graft.operators.{Materialize, TextOps}
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val eval = docs.filter(col("doc_id") % 7 === 0)
    val train = docs.filter(col("doc_id") % 7 =!= 0)
    val chkDir = java.nio.file.Files
      .createTempDirectory("graft-chk").toString
    spark.sparkContext.setCheckpointDir(chkDir)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toString).toSeq
    val prepDefault = canon(Pipeline.prepare(train, eval))
    assert(prepDefault ==
      canon(Pipeline.prepare(train, eval, Materialize.Persist)))
    assert(prepDefault ==
      canon(Pipeline.prepare(train, eval, Materialize.ReliableCheckpoint)))
    val packDefault = canon(TextOps.sequencePacking(docs))
    assert(packDefault == canon(
      TextOps.sequencePacking(docs, materialize = Materialize.Persist)))
    assert(packDefault == canon(TextOps.sequencePacking(docs,
      materialize = Materialize.ReliableCheckpoint)))
  }

  test("prepare on the real corpus: survivors are a subset with no " +
      "duplicate content and no eval 8-gram overlap") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val eval = docs.filter(col("doc_id") % 7 === 0)
    val train = docs.filter(col("doc_id") % 7 =!= 0)
    val out = Pipeline.prepare(train, eval).cache()
    val n = out.count()
    assert(n > 0 && n < train.count())
    // no two survivors share content
    val dupGroups = out.groupBy(md5(encode(col("text"), "UTF-8")))
      .count().filter(col("count") > 1).count()
    assert(dupGroups == 0)
    // no survivor shares an 8-gram with eval
    val overlaps = graft.operators.DedupOps
      .decontaminate(out, eval).count()
    assert(overlaps == 0)
    out.unpersist()
  }
}
