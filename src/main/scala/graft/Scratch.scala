package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling harness — not part of the library (deleted before commit)
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $tag min=${runs.min}%.3f runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }
    val l = Tables.lineitem(spark, d)
    l.count()

    time("q01_decimal") {
      SparkEntry.queries("q01_pricing_summary")(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    time("q01_double") {
      l.filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          avg(col("l_quantity")).as("avg_qty"),
          avg(col("l_extendedprice")).as("avg_price"),
          avg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
        .write.format("noop").mode("overwrite").save()
    }
    time("scan_only") {
      l.filter(col("l_shipdate") <= lit("1998-09-02"))
        .select("l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_linestatus")
        .write.format("noop").mode("overwrite").save()
    }
    time("t05_trigram") {
      SparkEntry.queries("t05_char_ngram_profile")(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    time("d03") {
      SparkEntry.queries("d03_ngram_jaccard_pairs")(spark, d)
        .write.format("noop").mode("overwrite").save()
    }

    // variant: df via one groupBy(sh) + collect_list + explode, no join
    def shingles2 = Tables.documents(spark, d)
      .select(col("doc_id"), split(trim(col("text")), " ").as("words"))
      .select(col("doc_id"),
        explode(expr(
          "CASE WHEN size(words) >= 3 THEN transform(sequence(0, size(words) - 3), " +
            "i -> xxhash64(concat_ws(' ', slice(words, i + 1, 3)))) " +
            "ELSE array() END")).as("sh"))
      .distinct()
    def shd2 = shingles2.groupBy(col("sh"))
      .agg(count(lit(1)).as("df"), collect_list(col("doc_id")).as("docs"))
      .select(col("sh"), col("df"), explode(col("docs")).as("doc_id"))
    time("d03_variant") {
      val sh = shingles2
      val shd = shd2
      val t = 0.8
      val prefix = shd
        .groupBy(col("doc_id"))
        .agg(collect_list(struct(col("df"), col("sh"))).as("l"))
        .select(col("doc_id"),
          explode(expr(s"slice(array_sort(l), 1, " +
            s"size(l) - CAST(ceil($t * size(l)) AS INT) + 1)")).as("e"))
        .filter(col("e.df") >= 2)
        .select(col("doc_id"), col("e.sh").as("sh"))
      val cand = prefix.select(col("doc_id").as("doc_a"), col("sh"))
        .join(prefix.select(col("doc_id").as("doc_b"), col("sh")), "sh")
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val shp = shd.filter(col("df") >= 2).select(col("doc_id"), col("sh"))
      val inter = cand
        .join(shp.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
        .join(shp.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sa")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sb")), "doc_b")
        .withColumn("jaccard",
          col("inter").cast("double") / (col("sa") + col("sb") - col("inter")))
        .filter(col("jaccard") >= 0.8)
        .select(col("doc_a"), col("doc_b"), col("inter"),
          (col("sa") + col("sb") - col("inter")).as("un"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
