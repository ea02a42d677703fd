package graft

import org.apache.spark.sql.functions._

class TmpPerfD03 extends SparkSpec {
  test("phases") {
    val d = "/root/testdata/sf0.1"
    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // mirror DedupOps internals
    def shingles() = Tables.documents(spark, d)
      .select(col("doc_id"), split(trim(col("text")), " ").as("words"))
      .select(col("doc_id"),
        explode(expr(
          "CASE WHEN size(words) >= 3 THEN transform(sequence(0, size(words) - 3), " +
            "i -> xxhash64(concat_ws(' ', slice(words, i + 1, 3)))) " +
            "ELSE array() END")).as("sh"))
      .distinct()
    def index() = {
      import org.apache.spark.sql.expressions.Window
      shingles().select(col("sh"),
        count(lit(1)).over(Window.partitionBy(col("sh"))).as("df"),
        col("doc_id"))
    }
    def full(): Unit = SparkEntry.queries("d03_ngram_jaccard_pairs")(spark, d).collect()
    full()
    val tSh = (1 to 2).map(_ => timeIt(shingles().write.format("noop").mode("overwrite").save())).min
    val tIdx = (1 to 2).map(_ => timeIt(index().write.format("noop").mode("overwrite").save())).min
    val tIdxCp = (1 to 2).map(_ => timeIt(index().localCheckpoint(true))).min
    val tFull = (1 to 2).map(_ => timeIt(full())).min
    info(f"shingles=$tSh%.3f index=$tIdx%.3f indexCheckpoint=$tIdxCp%.3f full=$tFull%.3f")
  }
}
