package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.Decimal

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions and sketch aggregates as SQL functions, so
  * `spark.sql("... double_dot_product(a, b) ...")` and
  * `spark.sql("... quantile_sketch(h, v, 128, 0.5) ...")` work
  * cluster-wide via
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  * [[GraftFunctions.register]] does the same for an existing session
  * (local/test convenience).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => DotProductRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftFunctions {
  private def intArg(e: Expression, fn: String): Int = e.eval() match {
    case n: Number => n.intValue
    case other => throw new IllegalArgumentException(
      s"$fn: expected an integer literal, got $other")
  }
  private def doubleArg(e: Expression, fn: String): Double = e.eval() match {
    case d: Decimal => d.toDouble // SQL numeric literals like 0.25
    case n: Number => n.doubleValue
    case other => throw new IllegalArgumentException(
      s"$fn: expected a numeric literal, got $other")
  }

  private def descriptor(name: String, clazz: Class[_],
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
      builder)

  /** Aggregate builders return the bare AggregateFunction — the analyzer
    * wraps it in an AggregateExpression itself. */
  private[functions] val descriptors = Seq(
    descriptor("double_dot_product", classOf[DoubleDotProduct],
      exprs => DoubleDotProduct(exprs(0), exprs(1))),
    descriptor("packed_trigrams", classOf[PackedTrigrams],
      exprs => PackedTrigrams(exprs(0))),
    // word_ngram_hashes(text, n): per-position word n-gram hash keys
    descriptor("word_ngram_hashes", classOf[WordGramHashes],
      exprs => WordGramHashes(exprs(0),
        intArg(exprs(1), "word_ngram_hashes"))),
    // minhash_signature(hashes, n): n-wide MinHash minima in one pass
    descriptor("minhash_signature", classOf[MinHashSignature],
      exprs => MinHashSignature(exprs(0),
        intArg(exprs(1), "minhash_signature"))),
    // affine_minhash_signature(fps, n): portable oracle-checkable twin
    descriptor("affine_minhash_signature", classOf[AffineMinHashSignature],
      exprs => AffineMinHashSignature(exprs(0),
        intArg(exprs(1), "affine_minhash_signature"))),
    // graft_topk(value, id, k): k rows with the largest (value, id)
    descriptor("graft_topk", classOf[TopKAggregate],
      exprs => TopKAggregate(exprs(0), exprs(1),
        intArg(exprs(2), "graft_topk"))),
    // simhash_agg(hash): 60-bit SimHash fold over a group's word hashes
    descriptor("simhash_agg", classOf[SimHashAggregate],
      exprs => SimHashAggregate(exprs(0))),
    // hll_register_agg(hash): 64-register HLL file over 60-bit hashes
    descriptor("hll_register_agg", classOf[HllRegisterAggregate],
      exprs => HllRegisterAggregate(exprs(0))),
    // cms_sketch_agg(hash, depth, width): Count-Min counter matrix
    descriptor("cms_sketch_agg", classOf[CmsSketchAggregate],
      exprs => CmsSketchAggregate(exprs(0),
        intArg(exprs(1), "cms_sketch_agg"),
        intArg(exprs(2), "cms_sketch_agg"))),
    // quantile_sketch(hash, value, k, p...): KMV bottom-k estimates
    descriptor("quantile_sketch", classOf[QuantileSketchAggregate],
      exprs => QuantileSketchAggregate(exprs(0), exprs(1),
        intArg(exprs(2), "quantile_sketch"),
        exprs.drop(3).map(doubleArg(_, "quantile_sketch")))),
    // graft_bloom_agg(key, numBits, numHashes): serialized Bloom filter
    descriptor("graft_bloom_agg", classOf[BloomFilterAggregate],
      exprs => BloomFilterAggregate(exprs(0),
        intArg(exprs(1), "graft_bloom_agg"),
        intArg(exprs(2), "graft_bloom_agg"))),
    // graft_bloom_contains(bloom, key): probe — false = definitely absent
    descriptor("graft_bloom_contains", classOf[BloomMightContain],
      exprs => BloomMightContain(exprs(0), exprs(1))),
    // bitmap_agg(key): exact-distinct bitmap over bounded dense ids
    descriptor("bitmap_agg", classOf[BitmapAggregate],
      exprs => BitmapAggregate(exprs(0))),
    // bitmap_count(b): exact cardinality of a serialized bitmap
    descriptor("bitmap_count", classOf[BitmapCount],
      exprs => BitmapCount(exprs(0))),
    // bitmap_and_count(a, b): exact intersection cardinality
    descriptor("bitmap_and_count", classOf[BitmapAndCount],
      exprs => BitmapAndCount(exprs(0), exprs(1))))

  /** Register on an already-built session: SQL functions plus the
    * dot-product rewrite (via the experimental-methods hook, the only
    * post-construction optimizer extension point). */
  def register(spark: SparkSession): Unit = {
    descriptors.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        id.funcName, builder, "built-in")
    }
    val em = spark.sessionState.experimentalMethods
    if (!em.extraOptimizations.contains(DotProductRewrite))
      em.extraOptimizations = em.extraOptimizations :+ DotProductRewrite
    if (!em.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      em.extraStrategies = em.extraStrategies :+ graft.plans.AsOfJoinStrategy
  }
}
