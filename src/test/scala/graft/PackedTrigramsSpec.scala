package graft

import graft.functions.{PackedTrigrams, TextFunctions}
import org.apache.spark.sql.functions._

/** packed_trigrams must be indistinguishable from the substring
  * formulation: same trigrams (after decode), same ordering (UTF-8
  * binary order == code-point order), Unicode-correct (code points, not
  * UTF-16 units), and injective packing.
  */
class PackedTrigramsSpec extends SparkSpec {

  test("pack/unpack round-trips and matches substring trigrams, " +
      "including non-ASCII and supplementary code points") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox",
      "ab", "", "abc",
      "café naïve über",
      "你好世界你好", // CJK
      "a😀b😁c") // supplementary (surrogate pairs)
    val df = texts.toDF("text")
    val viaExpr = df
      .select(col("text"), explode(TextFunctions.packedTrigrams(col("text")))
        .as("p"))
      .select(col("text"),
        udf((l: Long) => PackedTrigrams.unpack(l)).apply(col("p")).as("tri"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val viaSubstring = df
      .filter(length(col("text")) >= 3)
      .select(col("text"), explode(expr(
        "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"))
        .as("tri"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(viaExpr.toSeq == viaSubstring.toSeq)
  }

  test("packed-long ordering equals trigram string ordering") {
    import spark.implicits._
    val df = Seq("zebra éclair apple 世界 banana").toDF("text")
    val packed = df.select(explode(TextFunctions.packedTrigrams(col("text")))
      .as("p")).orderBy(col("p"))
      .collect().map(r => PackedTrigrams.unpack(r.getLong(0)))
    val strings = df.select(explode(expr(
      "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"))
      .as("tri")).orderBy(col("tri"))
      .collect().map(_.getString(0))
    assert(packed.toSeq == strings.toSeq)
  }

  test("non-string input fails analysis; SQL-callable after registration") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val e = intercept[Exception] {
      Seq(1L).toDF("x").select(TextFunctions.packedTrigrams(col("x"))).collect()
    }
    assert(e.getMessage.contains("expected STRING"), e.getMessage)
    val n = spark.sql("SELECT size(packed_trigrams('abcd')) AS n")
      .collect().head.getInt(0)
    assert(n == 2)
  }
}
