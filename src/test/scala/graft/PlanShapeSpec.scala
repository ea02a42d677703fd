package graft

import org.apache.spark.sql.DataFrame

/** Locks in the physical-plan properties the 100 TB design depends on:
  * parquet predicate pushdown + column pruning, broadcast join selection,
  * TakeOrderedAndProject for top-k, whole-stage codegen coverage, and the
  * codegen'd custom expression.
  */
class PlanShapeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q02: filters and projection reach the parquet scan") {
    val p = planOf("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"), p.take(800))
    assert(p.contains("GreaterThanOrEqual(l_quantity,30.0)"))
    // pruned read schema: only the 6 referenced columns, not all 11
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,"
      + "l_quantity:double,l_extendedprice:double,l_discount:double,"
      + "l_returnflag:string>"))
  }

  test("q03: dimension side broadcasts (no fact shuffle for the join)") {
    val p = planOf("q03_join_broadcast_agg")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("q04: top-k plans as TakeOrderedAndProject, not global sort") {
    val p = planOf("q04_topk_revenue")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q01: whole-stage codegen covers the aggregation pipeline") {
    // AQE finalizes the plan only on execution
    val df = SparkEntry.queries("q01_pricing_summary")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined,
      s"expected WholeStageCodegen stages:\n${p.take(800)}")
  }

  test("e01: custom dot-product expression participates in codegen " +
      "(no fallback marker in the pair-scan stage)") {
    val df = SparkEntry.queries("e01_cosine_pairs")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("double_dot_product") || p.contains("DoubleDotProduct")
      || p.contains("doubledotproduct"),
      s"expected custom expression in plan:\n${p.take(1200)}")
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined,
      "pair scan must stay inside whole-stage codegen")
  }

  test("fact-fact join falls back to shuffle sort-merge when neither " +
      "side broadcasts") {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, dir)
      val o = Tables.orders(spark, dir)
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(800))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      "10485760")
  }

  test("q47: interval join plans as an equi join on user_id with the " +
      "range predicate as join condition — never a nested-loop product") {
    val p = planOf("q47_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1200))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("q37: higher-order functions stay inside whole-stage codegen") {
    val df = SparkEntry.queries("q37_higher_order_fns")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined, p.take(800))
  }

  test("t05: trigram profile aggregates partially before the shuffle " +
      "and takes top-k without a global sort") {
    val p = planOf("t05_char_ngram_profile")
    assert(p.contains("HashAggregate"), p.take(800))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("double_dot_product is SQL-callable after extension registration") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT double_dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(r == 11.0)
  }

  test("q55: bucketed co-located join is exchange-free — the sort-merge " +
      "join reads bucket-aligned splits with no shuffle on either side") {
    import org.apache.spark.sql.functions._
    // invoking the query CTAS-es the bucketed tables as a side effect
    SparkEntry.queries("q55_bucketed_colocated_join")(spark, dir).collect()
    val j = spark.table("graft_orders_bucketed").hint("merge")
      .join(spark.table("graft_customer_bucketed"),
        col("o_custkey") === col("c_custkey"))
    j.collect()
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p.take(1200))
    assert(!p.contains("Exchange"),
      s"bucketed join must not shuffle:\n${p.take(1200)}")
  }

  test("e04: exact top-k ANN aggregates partially map-side (object-hash " +
      "aggregate), replacing e02's full-pair window sort") {
    val p = planOf("e04_ann_topk_partial")
    assert(p.contains("ObjectHashAggregate"), p.take(1200))
    assert(!p.contains("Window"),
      s"top-k must come from the aggregate, not a window sort:\n${p.take(1200)}")
  }

  test("q56: time-range window frame produces RangeFrame, one shuffle on " +
      "user_id only") {
    val df = SparkEntry.queries("q56_time_range_window")(spark, dir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("specifiedwindowframe(RangeFrame, -3600000000, currentrow"),
      p.take(1200))
  }

  test("q57: fact scan is pruned ONLY by the runtime DPP subquery — the " +
      "dim filter is data, not a propagatable constraint") {
    val df = SparkEntry.queries("q57_dpp_partitioned_join")(spark, dir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("dynamicpruningexpression"),
      s"expected a DPP partition filter on the fact scan:\n${p.take(1500)}")
    // the urgency-class predicate must NOT appear as a static partition
    // filter (that would mean constraint propagation did the pruning and
    // DPP proved nothing)
    assert(!p.contains("PartitionFilters: [(cast(substring"),
      s"dim predicate leaked into static partition filters:\n${p.take(1500)}")
  }

  test("e05: LSH candidate generation joins on (band, bucket) — never a " +
      "pair product — and verification reuses the codegen'd dot product") {
    val p = planOf("e05_lsh_cosine_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
    assert(p.toLowerCase.contains("doubledotproduct")
      || p.contains("double_dot_product"), p.take(1500))
  }

  test("runtime bloom filter: a selective dim filter injects " +
      "bloom_filter_agg/might_contain onto the fact side of a shuffle join") {
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = Tables.lineitem(spark, dir)
      val o = Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter_agg") || p.contains("might_contain"),
        s"expected an injected runtime bloom filter:\n${p.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q67: the engine-native bloom digest probes BELOW the probe-side " +
      "exchange (scalar-subquery filter on the scan), and the exact " +
      "semi join shuffles above it") {
    val p = planOf("q67_bloom_semi_join")
    assert(p.contains("SortMergeJoin LeftSemi"), p.take(1200))
    // the probe really is the bloom digest riding a scalar subquery
    // (a join-shaped probe would be reordered above the semi join)
    assert(p.contains("graft_bloom_contains(Subquery"),
      s"probe filter must be the scalar-subquery bloom digest:\n${p.take(1500)}")
    // operator ids are bottom-up within a subtree: the lineitem-side
    // Filter (probe) must carry a smaller id than the lineitem-side
    // Exchange — the digest discards rows BEFORE they reach the shuffle
    val probeFilterId = """\((\d+)\) Filter\nInput[^\n]*l_extendedprice""".r
      .findFirstMatchIn(p).map(_.group(1).toInt)
    val probeExchangeId = """\((\d+)\) Exchange\nInput[^\n]*l_extendedprice""".r
      .findFirstMatchIn(p).map(_.group(1).toInt)
    assert(probeFilterId.isDefined && probeExchangeId.isDefined,
      s"expected lineitem-side Filter and Exchange blocks:\n${p.take(1500)}")
    assert(probeFilterId.get < probeExchangeId.get,
      s"bloom probe (op ${probeFilterId.get}) must sit below the " +
        s"probe-side exchange (op ${probeExchangeId.get})")
  }

  /** Input column lists of every HASH-partitioned Exchange block in a
    * formatted plan — what actually crosses the wire on a keyed
    * shuffle (the result orderBy's range exchange and single-partition
    * collects are presentation/summary, not the scale path). */
  private def exchangeInputs(p: String): Seq[String] =
    """\(\d+\) Exchange\nInput[^\n]*\nArguments: hashpartitioning[^\n]*""".r
      .findAllIn(p).toSeq

  test("d11: the corpus text never shuffles — both hash exchanges (the " +
      "two-phase distinct-doc count) carry chunk fingerprints only, and " +
      "the boiler set arrives at the rewrite by broadcast") {
    val p = planOf("d11_boilerplate_strip")
    val ex = exchangeInputs(p)
    assert(ex.size == 2, s"expected the 2 fp-count exchanges, got:\n$ex")
    ex.foreach(e => assert(!e.contains("chunks") && !e.contains("text"),
      s"an exchange carries document content:\n$e"))
    assert(p.contains("BroadcastNestedLoopJoin"),
      "boiler set must arrive by broadcast")
  }

  test("d12: chunk text crosses exactly one exchange even with " +
      "broadcast off — the removal-set join reuses the doc_id " +
      "partitioning of both aggregates (bucketed-join shape, no buckets)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = planOf("d12_passage_dedup_keep_first")
      val ex = exchangeInputs(p)
      // fp-election agg, fp-side of the owners join, removal-set agg,
      // and the ONE text-carrying chunk agg — the doc_id join itself
      // must add none
      assert(ex.size == 4,
        s"expected 4 hash exchanges (fp agg, fp join side, rem agg, " +
          s"chunk agg), got ${ex.size}:\n${ex.mkString("\n")}")
      assert(ex.count(_.contains("chunk")) <= 1,
        s"more than one exchange carries chunk text:\n${ex.mkString("\n")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      "10485760")
  }

  test("t19: the gram frame's exchanges (distinct, fp window, source " +
      "rollup) carry the 8-byte fingerprint and source — never text") {
    val p = planOf("t19_source_novelty")
    val ex = exchangeInputs(p)
    assert(ex.size == 3,
      s"expected 3 hash exchanges (distinct, window, rollup), got:\n$ex")
    ex.foreach(e => assert(!e.contains("text"),
      s"an exchange carries document text:\n$e"))
  }

  test("q04/q35: fact-proportional sides carry no broadcast hint — with " +
      "auto-broadcast off, only the hinted dims broadcast and the " +
      "lineitem⋈orders edge shuffles (the 100 TB shape)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p4 = planOf("q04_topk_revenue")
      // customer keeps its dim hint; orders must NOT be broadcast
      assert(p4.contains("BroadcastHashJoin"), p4.take(1500))
      assert(p4.contains("SortMergeJoin") || p4.contains("ShuffledHashJoin"),
        s"orders edge must shuffle, not broadcast a fact table:\n${p4.take(1500)}")
      val p35 = planOf("q35_regional_revenue")
      assert(p35.contains("BroadcastHashJoin"), p35.take(1500))
      assert(p35.contains("SortMergeJoin") || p35.contains("ShuffledHashJoin"),
        s"orders/customer/supplier edges must shuffle:\n${p35.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      "10485760")
  }

  test("t07: two-phase prefix sum — every window over the corpus is " +
      "block-bounded; only the tiny per-block offset table gets a " +
      "per-lang window, and the offsets broadcast back") {
    val p = planOf("t07_sequence_packing")
    val winLines = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty, p.take(1200))
    // corpus-side windows (anything not over the aggregated blk_total
    // table) must partition by blk as well as lang — no task may own a
    // whole language
    val corpusWins = winLines.filterNot(_.contains("blk_total"))
    assert(corpusWins.nonEmpty, winLines.mkString("\n"))
    assert(corpusWins.forall(_.contains("blk")),
      s"found a corpus-wide per-lang window:\n${corpusWins.mkString("\n")}")
    assert(p.contains("BroadcastHashJoin"),
      s"offsets must broadcast-join back:\n${p.take(1200)}")
  }

  test("t11/t12: doc-local text operators keep the corpus out of every " +
      "exchange — the only shuffle is the final presentation sort") {
    Seq("t11_repetition_filter", "t12_doc_chunking").foreach { name =>
      val p = planOf(name)
      // no hash-partitioned exchange at all: the metric/chunking is a
      // pure map over the scan; rangepartitioning for the orderBy is
      // presentation-only and drops out of a pipeline composition
      assert(!p.contains("hashpartitioning"),
        s"$name: doc-local operator planned a hash exchange:\n${p.take(1500)}")
    }
  }

  test("d20/t30/t31: the row-local batch (winnow profile, PII scrub) " +
      "plans no hash exchange — presentation sort only") {
    Seq("d20_winnow_profile", "t30_pii_profile", "t31_pii_redaction")
      .foreach { name =>
        val p = planOf(name)
        // d20's whole winnowing selection and the PII regex work are
        // array/string expressions inside one projection; t30's rollup
        // partial-aggregates to |sources| rows before its exchange
        if (name == "t30_pii_profile")
          assert(p.contains("hashpartitioning(source"),
            s"$name: the only exchange keys on source:\n${p.take(1500)}")
        else
          assert(!p.contains("hashpartitioning"),
            s"$name: row-local operator planned a hash exchange:\n${
              p.take(1500)}")
      }
  }

  test("t13: the corpus-wide stage is a map-side partial aggregate; " +
      "rank/coverage windows run over the vocabulary only") {
    val p = planOf("t13_vocab_coverage")
    // partial_count before the exchange = map-side combine on term
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"term counting must partial-aggregate map-side:\n${p.take(1500)}")
    assert(p.contains("hashpartitioning(term"),
      s"the only corpus exchange keys on term:\n${p.take(1500)}")
  }

  test("word_ngram_hashes stays inside whole-stage codegen (no " +
      "interpreted lambda in the dedup scan stage)") {
    val df = SparkEntry.queries("d08_decontamination")(spark, dir)
    df.collect() // finalize the adaptive plan so codegen spans appear
    // AQE's toString prints Final + Initial plans; only the final one
    // carries codegen stage markers
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // every Generate node carrying the expression must be inside a
    // WholeStageCodegen span — starred `*(n)` in the simple plan form
    val gens = p.linesIterator
      .filter(_.contains("word_ngram_hashes")).toSeq
    assert(gens.nonEmpty, p.take(1200))
    assert(gens.forall(_.matches(""".*\*\(\d+\) Generate .*""")),
      s"word_ngram_hashes fell out of codegen:\n${gens.mkString("\n")}")
  }

  test("d01: the exact-dedup exchange carries md5 fingerprints, never " +
      "document text — aggregation keys on fp with map-side partials") {
    val df = SparkEntry.queries("d01_dedup_exact")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(fp"),
      s"dedup must shuffle on the fingerprint:\n${p.take(1500)}")
    // the text column must die at the scan/project below the first
    // (partial) aggregate: no hash exchange may carry it
    val exchangeLines = p.linesIterator
      .filter(_.contains("hashpartitioning")).toSeq
    assert(exchangeLines.nonEmpty, p.take(1500))
    assert(exchangeLines.forall(!_.contains("text")),
      s"document text leaked into a shuffle:\n${exchangeLines.mkString("\n")}")
  }

  test("d09: incremental near-dedup never shuffles the corpus — the " +
      "batch bands and candidate ids broadcast, text never rides an " +
      "exchange, and hash exchanges are candidate-bounded") {
    val df = SparkEntry.queries("d09_neardup_against")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // batch bands + candidate-id set + batch shingles all broadcast
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    // no exchange may carry the corpus text — only derived keys shuffle
    val exchangeLines = p.linesIterator
      .filter(_.contains("hashpartitioning")).toSeq
    assert(exchangeLines.forall(!_.contains("text")),
      s"corpus text leaked into a shuffle:\n${exchangeLines.mkString("\n")}")
    // exchange inventory: candidate-id distinct + intersection groupBy
    // (both candidate-bounded) — anything more means the corpus side
    // started shuffling. AQE prints the plan twice (final + initial),
    // so dedupe by the WHOLE normalized exchange line (not a
    // paren-bounded regex group, which a nested function call in the
    // key list would truncate into false merges).
    val distinctExchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .map(_.replaceAll("#\\d+", "").replaceAll("\\[plan_id=\\d+\\]", "")
        .dropWhile(c => !c.isLetter).trim)
      .toSet
    assert(distinctExchanges.size <= 2,
      s"expected <= 2 candidate-bounded hash exchanges, got " +
        s"${distinctExchanges.size}: $distinctExchanges")
  }

  test("sketch aggregates are SQL-callable: graft_topk and quantile_sketch " +
      "run from SQL text with literal k / percentile args") {
    graft.functions.GraftFunctions.register(spark)
    spark.range(1, 101).selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("sketch_in")
    val top = spark.sql(
      "SELECT graft_topk(v, id, 3) AS t FROM sketch_in")
      .selectExpr("transform(t, x -> x.id) AS ids")
      .collect().head.getSeq[Long](0)
    assert(top == Seq(100L, 99L, 98L))
    // hash = value so the bottom-k sample is just 1..64: quantiles exact
    val qs = spark.sql(
      "SELECT quantile_sketch(id, id, 64, 0.25, 0.5) AS q FROM sketch_in")
      .collect().head.getSeq[Double](0)
    assert(qs == Seq(16.75, 32.5))
    // invalid args fail analysis, not mid-task
    val e = intercept[Exception](spark.sql(
      "SELECT graft_topk(v, id, 0) FROM sketch_in").collect())
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(e).contains("k must be >= 1"))
    val e2 = intercept[Exception](spark.sql(
      "SELECT graft_topk(id, id, 3) FROM sketch_in").collect())
    assert(msgs(e2).contains("value must be DOUBLE"))
  }

  test("q107: orientation lookups broadcast and the closure is the " +
      "adjacency intersection — no wedge-sized exchange, no product join") {
    val df = SparkEntry.queries("q107_triangle_count")(spark, dir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    // the closure is array_intersect over collected adjacency — the
    // wedge set never appears as a join. (The broadcast degree lookups
    // run inside the eager Materialize stage, so they are upstream of
    // this plan's checkpoint scan by design.)
    assert(p.contains("array_intersect"), p.take(1200))
  }

  test("q113: the skyline is decided by windows (one RangeFrame to " +
      "cost-1), never a dominance self-join") {
    val df = SparkEntry.queries("q113_supplier_skyline")(spark, dir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("specifiedwindowframe(RangeFrame, unboundedpreceding$(), -1)"),
      p.take(1500))
    // exactly the order/supplier joins — no self-join of the
    // quantized frame
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("q114: HLL registers partial-aggregate map-side — the exchange " +
      "carries (priority, bucket) register rows, not order rows") {
    val df = SparkEntry.queries("q114_hll_distinct")(spark, dir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // partial_max(rho) below the exchange = the register build combines
    // before shuffling
    assert(p.contains("partial_max") || p.contains("partial max") ||
      "HashAggregate.*max".r.findFirstIn(p).isDefined, p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("q126: the register aggregate partial-aggregates map-side — the " +
      "exchange carries one 64-byte register file per (partition, " +
      "priority), the tightest distinct-sketch shuffle") {
    val p = planOf("q126_hll_agg")
    // TypedImperativeAggregate plans as ObjectHashAggregate; the partial
    // stage must sit BELOW the first exchange
    val firstAgg = p.indexOf("ObjectHashAggregate")
    val firstExchange = p.indexOf("Exchange")
    assert(firstAgg >= 0 && firstExchange >= 0, p.take(800))
    assert(p.contains("partial_hll_register_agg"), p.take(1500))
    // plan prints leaves deepest-last in formatted mode, so partial-agg
    // below the exchange means its node number is LOWER
    val nums = "\\((\\d+)\\) (ObjectHashAggregate|Exchange)".r
      .findAllMatchIn(p).map(m => (m.group(1).toInt, m.group(2))).toList
    val firstAggNum = nums.collect {
      case (n, "ObjectHashAggregate") => n }.min
    val firstExNum = nums.collect { case (n, "Exchange") => n }.min
    assert(firstAggNum < firstExNum,
      s"partial aggregate must precede the exchange: $nums")
  }

  test("q129: the CMS aggregate partial-aggregates map-side — the " +
      "exchange carries one 2 KB counter matrix per partition, never " +
      "the keys (the q126 shuffle shape for the frequency sketch)") {
    val p = planOf("q129_cms_frequency")
    assert(p.contains("partial_cms_sketch_agg"), p.take(1500))
    // the plan interleaves the exact-count branch, so scope the
    // partial-before-exchange check to the sketch branch's own pair:
    // partial OHA → exchange → final OHA must appear as consecutive
    // node numbers among the OHA/Exchange nodes
    val nums = "\\((\\d+)\\) (ObjectHashAggregate|Exchange)".r
      .findAllMatchIn(p).map(m => (m.group(1).toInt, m.group(2))).toList
    val ohas = nums.collect { case (n, "ObjectHashAggregate") => n }
    assert(ohas.size == 2, s"expected partial+final OHA: $nums")
    assert(nums.exists { case (n, kind) =>
      kind == "Exchange" && n > ohas.min && n < ohas.max },
      s"the sketch exchange must sit between the partial and final " +
        s"aggregates: $nums")
  }

  test("q141: the dominance-grid tau plan is window-over-keyed-grid — " +
      "no product join replaces the O(n^2) pair count, the nation dims " +
      "broadcast, and the window partitions by nation") {
    val p = planOf("q141_kendall_tau")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(p.contains("Window"), p.take(1200))
    // the grid window must be keyed (partitioned), not global: every
    // Window node's partition spec mentions nation
    val specs = "Arguments.*partition.*".r.findAllIn(p).toList
    assert(p.split("\n").filter(_.contains("Window"))
      .forall(_ => p.contains("nation")), specs.mkString("\n"))
  }

  test("q145: the backtest fans out bounded (explode of sequence(1,8)) " +
      "and every exchange is keyed — no per-week rescan join of the " +
      "fact table") {
    val p = planOf("q145_quantile_coverage")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(p.contains("Generate"), p.take(1200))
    // orders is scanned exactly once: a single parquet scan node
    // (formatted explain names each node as "(n) Scan parquet" in the
    // details section — count those, not tree echoes)
    val scanIds = p.split("\n").filter(_.matches("\\(\\d+\\) Scan parquet.*"))
    assert(scanIds.length == 1, s"expected one fact scan:\n" +
      p.split("\n").filter(_.contains("Scan")).mkString("\n"))
  }
}
