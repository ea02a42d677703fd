package graft

import org.apache.spark.sql.functions._

/** The optimizer rule that turns the declarative HOF dot product into
  * the codegen'd native expression must fire on exactly the dot-product
  * shape, preserve results bit-for-bit (incl. zip_with's null-on-
  * length-mismatch and null-element propagation), and leave
  * non-matching shapes alone.
  */
class DotProductRewriteSpec extends SparkSpec {

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"

  test("the HOF dot-product shape rewrites to double_dot_product on " +
      "parquet-backed (nullable-element) arrays") {
    graft.functions.GraftFunctions.register(spark)
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .selectExpr("CAST(embedding AS ARRAY<DOUBLE>) AS a")
      .withColumn("b", col("a"))
      .selectExpr(s"$hof AS dot")
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.contains("double_dot_product"), p)
    assert(!p.contains("aggregate("), p)
    // and the rewritten plan computes the exact self-dot values
    val viaManual = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .selectExpr("CAST(embedding AS ARRAY<DOUBLE>) AS a")
      .select(graft.functions.VectorFunctions
        .dotProduct(col("a"), col("a")).as("dot"))
      .collect().map(_.getDouble(0)).toSeq
    val viaHof = df.collect().map(_.getDouble(0)).toSeq
    assert(viaHof == viaManual)
  }

  test("rewritten result is bit-identical to the interpreted HOF form: " +
      "null element, length mismatch, null array, empty") {
    import spark.implicits._
    val df = Seq(
      ("plain", Seq[java.lang.Double](1.0, 2.0, 3.0),
        Seq[java.lang.Double](4.0, 5.0, 6.0)),
      ("nullelem", Seq[java.lang.Double](1.0, null, 3.0),
        Seq[java.lang.Double](4.0, 5.0, 6.0)),
      ("lenmismatch", Seq[java.lang.Double](0.1, 0.2),
        Seq[java.lang.Double](0.3, 0.7, 9.9)),
      ("empty", Seq.empty[java.lang.Double], Seq.empty[java.lang.Double]),
      ("nullarray", null, Seq[java.lang.Double](1.0)))
      .toDF("tag", "a", "b")
      // a real exchange between the data and the projection so
      // ConvertToLocalRelation can't pre-evaluate the expression
      .repartition(2)
    def run(): Seq[(String, Option[Double])] =
      df.selectExpr("tag", s"$hof AS dot").collect()
        .map(r => (r.getString(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSeq.sortBy(_._1)
    val em = spark.sessionState.experimentalMethods
    val before = em.extraOptimizations
    em.extraOptimizations = Seq.empty
    val expected = try run() finally em.extraOptimizations = before
    graft.functions.GraftFunctions.register(spark)
    val plan = df.selectExpr(s"$hof AS dot")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("double_dot_product"), plan)
    val got = run()
    assert(got == expected)
    val byTag = got.toMap
    assert(byTag("plain").contains(32.0))
    assert(byTag("nullelem").isEmpty, "null element must null the sum")
    assert(byTag("lenmismatch").isEmpty, "length mismatch must stay null")
    assert(byTag("empty").contains(0.0))
    assert(byTag("nullarray").isEmpty)
  }

  test("non-dot-product shapes are left alone (int arrays, different fold)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val ints = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b").repartition(2)
      .selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0, (acc, v) -> acc + v) AS s")
    assert(!ints.queryExecution.optimizedPlan.toString
      .contains("double_dot_product"))
    assert(ints.collect().head.getInt(0) == 11)
    val maxFold = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .selectExpr("CAST(embedding AS ARRAY<DOUBLE>) AS a")
      .withColumn("b", col("a"))
      .selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> greatest(acc, v)) AS m")
      .queryExecution.optimizedPlan.toString
    assert(!maxFold.contains("double_dot_product"), maxFold)
  }
}
