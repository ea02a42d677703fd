package graft

import org.apache.spark.sql.functions._

/** Pins the fused [[graft.functions.Md5GramFps]] codegen expression
  * bit-identical to the declarative md5 word-gram idiom it replaces
  * across the d/t families (round 12): sliding
  * `transform(sequence(1, size(ws)-n+1), i -> conv(substring(md5(
  * array_join(slice(ws, i, n), ' ')),1,15),16,10))` and chunked
  * `transform(sequence(0, (size(ws)-1) div n), i -> ... slice(ws,
  * i*n+1, n) ...)`. Every DuckDB oracle built on the md5-prefix
  * Horner parse of those grams depends on this equality.
  */
class Md5GramFpsSpec extends SparkSpec {

  private val samples = Seq("", " ", "a", "a b", "a  b", "  a b c  ",
    "one two three four five six seven eight nine ten",
    "x " * 40 + "tail", "héllo wörld unicode グラム gram gram",
    "a b c d e f g h", "dup dup dup dup dup dup dup dup dup")

  private def slidingDecl(n: Int) = expr(
    s"CASE WHEN size(split(trim(s), ' ')) >= $n THEN " +
      s"transform(sequence(1, size(split(trim(s), ' ')) - ${n - 1}), " +
      s"i -> CAST(conv(substring(md5(encode(array_join(slice(" +
      s"split(trim(s), ' '), i, $n), ' '), 'UTF-8')), 1, 15), 16, 10) " +
      "AS BIGINT)) ELSE CAST(array() AS ARRAY<BIGINT>) END")

  private def chunkedDecl(n: Int) = expr(
    s"transform(sequence(0, (size(split(trim(s), ' ')) - 1) div $n), " +
      s"i -> CAST(conv(substring(md5(encode(array_join(slice(" +
      s"split(trim(s), ' '), i*$n + 1, $n), ' '), 'UTF-8')), 1, 15), " +
      "16, 10) AS BIGINT))")

  test("sliding fps == declarative md5 gram chain on adversarial " +
      "strings (empty, multi-space, unicode, short docs) for n in 2..8") {
    import spark.implicits._
    val df = samples.toDF("s")
    for (n <- Seq(2, 3, 5, 8)) {
      val bad = df.select(
          graft.functions.TextFunctions.md5GramFps(col("s"), n).as("fused"),
          slidingDecl(n).as("decl"))
        .filter(not(col("fused") <=> col("decl"))).count()
      assert(bad == 0, s"sliding n=$n diverges from the declarative form")
    }
  }

  test("chunked fps == declarative chunked md5 chain (incl. the short " +
      "last chunk and the single-empty-word document) for n in 3, 16") {
    import spark.implicits._
    val df = samples.toDF("s")
    for (n <- Seq(3, 16)) {
      val bad = df.select(
          graft.functions.TextFunctions.md5GramFps(col("s"), n, n)
            .as("fused"),
          chunkedDecl(n).as("decl"))
        .filter(not(col("fused") <=> col("decl"))).count()
      assert(bad == 0, s"chunked n=$n diverges from the declarative form")
    }
  }

  test("real-corpus parity at sf0.001: the t19 8-gram and t17 16-chunk " +
      "frames match the declarative forms row-for-row") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text").as("s"))
    val slide = docs.select(
        graft.functions.TextFunctions.md5GramFps(col("s"), 8).as("fused"),
        slidingDecl(8).as("decl"))
      .filter(not(col("fused") <=> col("decl"))).count()
    assert(slide == 0)
    val chunk = docs.select(
        graft.functions.TextFunctions.md5GramFps(col("s"), 16, 16)
          .as("fused"),
        chunkedDecl(16).as("decl"))
      .filter(not(col("fused") <=> col("decl"))).count()
    assert(chunk == 0)
  }

  test("null text propagates null") {
    import spark.implicits._
    val out = Seq(Some("a b c"), None).toDF("s")
      .select(graft.functions.TextFunctions.md5GramFps(col("s"), 2))
      .collect()
    assert(out.count(_.isNullAt(0)) == 1)
  }
}
