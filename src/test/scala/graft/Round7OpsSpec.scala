package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-7 batch: PII scrub completeness, winnowing
  * theory bounds plus the cross-check against the exact-Jaccard pairs,
  * and the lifecycle/market-structure algebra (value-level equality vs
  * the DuckDB oracle runs via graft.Verify + tools/compare.py).
  */
class Round7OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("t31: redaction removes every PII match it counted") {
    // Re-running the four detectors over the redacted text must find
    // nothing — checked via the fingerprint surface: redact twice and
    // the fingerprint must be a fixed point.
    val res = ("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}" ::
      "\\d{3}-\\d{2}-\\d{4}" ::
      "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}" ::
      "https?://[a-z0-9./_-]+" :: Nil)
    val once = q("t31_pii_redaction")
    assert(once.count() > 0)
    // The placeholders themselves must not re-match any detector (an
    // unstable replacement token would make redaction non-idempotent).
    for (tok <- Seq("[EMAIL]", "[PHONE]", "[IP]", "[URL]"); re <- res)
      assert(!re.r.findFirstIn(tok).isDefined,
        s"placeholder $tok re-matches $re")
  }

  test("t30: every source's PII doc rate is in (0, 1]") {
    val rows = q("t30_pii_profile").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rate = r.getAs[Double]("pii_doc_rate")
      assert(rate > 0.0 && rate <= 1.0, s"rate out of range: $r")
    }
  }

  test("d20: winnowing density obeys the theory bounds") {
    // Full-window docs keep between 1/w and all of their grams; every
    // doc with >= k tokens fingerprints (the short-doc truncated-window
    // rule guarantees >= 1 fingerprint).
    val rows = q("d20_winnow_profile").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nFp = r.getAs[Long]("n_fp")
      val nGrams = r.getAs[Long]("n_grams")
      assert(nFp >= 1L && nFp <= nGrams, s"fingerprint count off: $r")
      if (nGrams >= 4)
        assert(nFp.toDouble >= nGrams / 4.0 - 1,
          s"density below the 1/w floor: $r")
    }
  }

  test("d21: winnow candidates find the exact-Jaccard near-dup pairs") {
    // Winnowing guarantees shared runs produce shared fingerprints, so
    // the d03 exact-Jaccard (>= 0.8) pairs must all surface as winnow
    // candidates — recall 1.0 against the exact baseline on this
    // corpus; precision is allowed to be lower (candidates are a
    // superset that a verify stage would filter).
    val winnow = q("d21_winnow_pairs")
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = q("d03_ngram_jaccard_pairs")
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = exact -- winnow
    assert(missed.isEmpty, s"exact near-dup pairs missed by winnowing: $missed")
  }

  test("q98: the LTV curve is monotone per cohort and starts at month 0") {
    val rows = q("q98_cohort_ltv")
      .select(col("cohort_month"), col("months_since"), col("cum_ltv"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cohort, cells) =>
      val byMonth = cells.sortBy(_._2)
      assert(byMonth.head._2 == 0, s"cohort $cohort missing month 0")
      byMonth.sliding(2).foreach {
        case Array((_, _, a), (_, _, b)) =>
          assert(b >= a, s"cohort $cohort LTV not monotone")
        case _ => ()
      }
    }
  }

  test("q99: Benford digits cover 1-9 and observed shares sum to 1") {
    val rows = q("q99_benford_profile").collect()
    val digits = rows.map(_.getAs[Int]("digit")).toSet
    assert(digits.subsetOf((1 to 9).toSet), s"bad digits: $digits")
    val total = rows.map(_.getAs[Double]("obs_share")).sum
    assert(math.abs(total - 1.0) < 1e-9, s"obs shares sum to $total")
  }

  test("e23: MMR picks are distinct, rank-1 is the top candidate, and " +
      "scores never beat pure relevance") {
    val rows = q("e23_mmr_rerank").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (qid, picks) =>
      val ids = picks.map(_.getAs[Long]("c_id"))
      assert(ids.distinct.length == ids.length,
        s"query $qid picked a candidate twice")
      val byRank = picks.sortBy(_.getAs[Int]("pick_rank"))
      // pick 1 is relevance-only, so it must carry the max relevance
      val rel1 = byRank.head.getAs[Double]("relevance")
      assert(picks.forall(_.getAs[Double]("relevance") <= rel1 + 1e-12),
        s"query $qid pick 1 is not the most relevant")
      // pick 1 scores exactly 0.7 * relevance; later picks shift it by
      // at most 0.3 * |max cosine to the picked set| <= 0.3 (the
      // penalty term can be negative when the nearest pick is
      // anti-correlated, so it can raise the score too)
      assert(math.abs(byRank.head.getAs[Double]("mmr_score")
        - 0.7 * rel1) < 1e-12, s"query $qid pick 1 score is not 0.7*rel")
      byRank.foreach { p =>
        assert(math.abs(p.getAs[Double]("mmr_score")
          - 0.7 * p.getAs[Double]("relevance")) <= 0.3 + 1e-12,
          s"query $qid has a score outside the MMR bound")
      }
    }
  }

  test("m14: scene accounting is consistent per medium") {
    val rows = q("m14_scene_cuts").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val frames = r.getAs[Long]("n_frames")
      val cuts = r.getAs[Long]("n_cuts")
      assert(r.getAs[Long]("n_scenes") == cuts + 1)
      assert(cuts >= 0 && cuts < frames, s"cut count impossible: $r")
    }
  }

  test("q101: debounce keeps at least one event per user and never " +
      "more than it saw") {
    val rows = q("q101_debounce_compress").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_events")
      val kept = r.getAs[Long]("n_kept")
      assert(kept >= 1 && kept <= n, s"kept count out of range: $r")
      val rate = r.getAs[Double]("compression_rate")
      assert(rate >= 0.0 && rate < 1.0, s"rate out of range: $r")
    }
  }

  test("e24: the k sweep is well-formed — cells grow as the sampling " +
      "mod shrinks, imbalance >= 1, recall in [0, 1]") {
    val rows = q("e24_ivf_k_sweep").collect()
      .sortBy(_.getAs[Int]("sample_mod"))
    assert(rows.length == 3)
    val cells = rows.map(_.getAs[Long]("n_cells"))
    assert(cells.zip(cells.tail).forall { case (a, b) => a >= b },
      s"smaller mod must give at least as many cells: ${cells.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Double]("imbalance") >= 1.0 - 1e-12, s"$r")
      val rec = r.getAs[Double]("recall_at_1")
      assert(rec >= 0.0 && rec <= 1.0, s"$r")
      assert(r.getAs[Double]("max_cell_share") <= 1.0, s"$r")
    }
  }

  test("d23: estimates and errors stay in range; every bucket holds " +
      "at least one pair") {
    val rows = q("d23_minhash_error_profile").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") >= 1L)
      val est = r.getAs[Double]("mean_est")
      assert(est >= 0.0 && est <= 1.0, s"$r")
      val err = r.getAs[Double]("max_abs_err")
      assert(err >= 0.0 && err <= 1.0, s"$r")
      // davg quantizes to 6 decimals, so the mean can sit up to 5e-7
      // above the exact max
      assert(r.getAs[Double]("mean_abs_err") <= err + 1e-6, s"$r")
    }
  }

  test("d24: the funnel only shrinks, and the arithmetic is internally " +
      "consistent") {
    val rows = q("d24_pipeline_funnel").collect()
      .sortBy(_.getAs[Int]("stage_idx"))
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      Seq("raw", "quality", "dedup_exact", "decontaminated"))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_docs") <= a.getAs[Long]("n_docs"))
        assert(b.getAs[Long]("n_tokens") <= a.getAs[Long]("n_tokens"))
        assert(b.getAs[Long]("docs_dropped") ==
          a.getAs[Long]("n_docs") - b.getAs[Long]("n_docs"))
      case _ => ()
    }
  }

  test("t33: the resample only shrinks and achieved shares sum to 1") {
    val rows = q("t33_mixture_resample").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_after") <= r.getAs[Long]("n_before"), s"$r")
      assert(r.getAs[Long]("tok_after") <= r.getAs[Long]("tok_before"),
        s"$r")
    }
    val total = rows.map(_.getAs[Double]("achieved_share")).sum
    assert(math.abs(total - 1.0) < 1e-9, s"achieved shares sum to $total")
  }

  test("q100: HHI lies in [1/n, 1] per region") {
    val rows = q("q100_hhi_concentration").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_suppliers")
      val hhi = r.getAs[Double]("hhi")
      assert(hhi >= 1.0 / n - 1e-12 && hhi <= 1.0 + 1e-12,
        s"HHI out of range: $r")
    }
  }

  test("q103: expected counts rebuild the observed marginals") {
    // Under the independence model the expected counts sum to the same
    // grand total as the observed ones, and every chi-square term is
    // non-negative — the algebra that makes the per-cell table a valid
    // decomposition of the chi-square statistic.
    val rows = q("q103_chisq_association").collect()
    assert(rows.nonEmpty)
    val obs = rows.map(_.getAs[Long]("n_obs")).sum.toDouble
    val exp = rows.map(_.getAs[Double]("expected")).sum
    assert(math.abs(obs - exp) < 1e-6 * obs, s"sum(expected)=$exp != $obs")
    rows.foreach(r =>
      assert(r.getAs[Double]("chi2_term") >= 0.0, s"negative term: $r"))
  }

  test("q104: each region's first week smooths to itself") {
    // With no history the dyadic weights collapse to the single current
    // term (num = 128 c, den = 128), so ewma == revenue exactly — the
    // partial-window normalization working as specified.
    val rows = q("q104_ewma_revenue").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("r_name")).foreach { case (_, rs) =>
      val first = rs.minBy(_.getAs[Long]("wk"))
      assert(first.getAs[Double]("ewma_revenue") ==
        first.getAs[Double]("revenue"), s"first-week ewma off: $first")
    }
  }

  test("q105: damped rank mass is conserved within truncation slack") {
    // Every node has out-edges (the graph is symmetric), so iteration
    // redistributes all rank mass: sum(r') = 0.15e6 n + 0.85 sum(r)
    // minus only integer-truncation losses (< deg units per node).
    val rows = q("q105_copurchase_pagerank").collect()
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    val total = rows.map(_.getAs[Long]("rank_micro")).sum
    assert(math.abs(total - n * 1000000L) < 0.01 * n * 1000000L,
      s"rank mass drifted: $total vs ${n * 1000000L}")
    rows.foreach { r =>
      assert(r.getAs[Long]("rank_micro") >= 150000L, s"below floor: $r")
      assert(r.getAs[Long]("degree") >= 1L)
    }
  }

  test("d25: graded scores agree with d08's binary verdicts") {
    // Every doc d08 flags must score > 0 with the SAME shared-gram
    // count; every doc d08 is silent on must score exactly 0 — the
    // graded report is a strict superset of the binary one.
    val binary = q("d08_decontamination").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared"))
      .toMap
    val graded = q("d25_contamination_score").collect()
    assert(graded.length > binary.size, "graded report lost clean docs")
    graded.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val shared = r.getAs[Long]("n_shared")
      val c = r.getAs[Double]("contamination")
      binary.get(id) match {
        case Some(n) =>
          assert(shared == n, s"doc $id: graded $shared vs binary $n")
          assert(c > 0.0 && c <= 1.0, s"doc $id: score $c out of range")
        case None =>
          assert(shared == 0L && c == 0.0, s"clean doc $id scored: $r")
      }
    }
  }

  test("d26: inflation books reconcile with d01's canonical count") {
    val rows = q("d26_dup_inflation").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dups") < r.getAs[Long]("n_docs"), s"$r")
      assert(r.getAs[Long]("bytes_wasted") <= r.getAs[Long]("bytes_total"),
        s"$r")
    }
    // Global: docs minus non-canonical copies == d01's distinct texts.
    val kept = rows.map(r =>
      r.getAs[Long]("n_docs") - r.getAs[Long]("n_dups")).sum
    assert(kept == q("d01_dedup_exact").count(),
      "kept-doc count disagrees with d01")
  }

  test("q106: burst points need at least three errors") {
    val rows = q("q106_error_bursts").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_errors")
      val b = r.getAs[Long]("n_burst_points")
      assert(b >= 0L && b <= math.max(0L, n - 2), s"burst bound: $r")
    }
  }

  test("d27: the signature matrix covers every source pair with " +
      "estimates and truth in [0, 1]") {
    val rows = q("d27_source_minhash_jaccard").collect()
    val nSources = SparkEntry.queries("d26_dup_inflation")(spark, dir)
      .count()
    assert(rows.length == nSources * (nSources - 1) / 2,
      s"${rows.length} pairs for $nSources sources")
    rows.foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      val ex = r.getAs[Double]("exact_jaccard")
      assert(est >= 0.0 && est <= 1.0, s"$r")
      assert(ex >= 0.0 && ex <= 1.0, s"$r")
      assert(math.abs(r.getAs[Double]("abs_err") - math.abs(est - ex))
        < 1e-12, s"$r")
    }
  }

  test("e25: one medoid per multi-member cell, cosines in range") {
    val rows = q("e25_cell_medoid").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("cell")).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") >= 2L, s"$r")
      val mc = r.getAs[Double]("mean_cos")
      assert(mc >= -1.0 - 1e-9 && mc <= 1.0 + 1e-9, s"$r")
    }
  }

  test("q107: triangle counts respect the wedge bound and sum to a " +
    "multiple of 3") {
    val rows = q("q107_triangle_count").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val deg = r.getAs[Long]("degree")
      val tri = r.getAs[Long]("n_triangles")
      assert(tri <= deg * (deg - 1) / 2, s"triangles exceed wedges: $r")
      val c = r.getAs[Double]("clustering")
      assert(c >= 0.0 && c <= 1.0, s"clustering out of [0,1]: $r")
    }
    // Each triangle contributes one count to each of its 3 vertices.
    assert(rows.map(_.getAs[Long]("n_triangles")).sum % 3 == 0)
  }

  test("q108: every surfaced cell is beyond sqrt(2) sigma and carries a " +
    "consistent dow") {
    val rows = q("q108_seasonal_anomaly").collect()
    assert(rows.nonEmpty, "anomaly cut fired on nothing — threshold " +
      "exceeds the small-sample bound sqrt(n-1)?")
    rows.foreach { r =>
      val z = r.getAs[Double]("z")
      assert(z * z > 2.0 - 1e-9, s"not an anomaly: $r")
      val dow = r.getAs[Int]("dow")
      assert(dow >= 0 && dow <= 6, s"dow out of range: $r")
      assert(r.getAs[Long]("cnt") >= 0L)
    }
  }

  test("q109: shares sum to 1 per region and ranks are a permutation") {
    val rows = q("q109_revenue_share").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("r_name")).foreach { case (_, rs) =>
      val shareSum = rs.map(_.getAs[Double]("share")).sum
      assert(math.abs(shareSum - 1.0) < 1e-9, s"shares sum to $shareSum")
      assert(rs.map(_.getAs[Int]("rnk")).sorted.sameElements(1 to rs.length))
    }
  }

  test("e26: filtered recall is in [0,1] and every label's queries " +
    "are its members with a same-label neighbour available") {
    val rows = q("e26_filtered_ann").collect()
    assert(rows.nonEmpty)
    val labelSizes = graft.Tables.embeddings(spark, dir)
      .groupBy(col("label")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val lbl = r.getAs[Int]("label")
      val nq = r.getAs[Long]("n_queries")
      assert(nq == labelSizes(lbl),
        s"every member of a >=2 label is a query: $r vs ${labelSizes(lbl)}")
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0, s"recall out of range: $r")
      assert(r.getAs[Long]("n_recalled") <= nq)
    }
  }

  test("q110: quartiles are 1..4, pct_rank and cume are in [0,1] and " +
    "cume is the running row share") {
    val rows = q("q110_distribution_windows").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("n_name")).foreach { case (_, rs) =>
      val n = rs.length
      rs.foreach { r =>
        assert((1 to 4).contains(r.getAs[Int]("quartile")))
        val pr = r.getAs[Double]("pct_rank")
        val cd = r.getAs[Double]("cume")
        assert(pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0)
      }
      // distinct sort keys -> cume values are exactly k/n for k=1..n
      val cds = rs.map(_.getAs[Double]("cume")).sorted
      assert(cds.zipWithIndex.forall { case (c, i) =>
        math.abs(c - (i + 1).toDouble / n) < 1e-12 })
    }
  }

  test("q111: correlations are in [-1,1] and lines~quantity is " +
    "strongly positive") {
    val rows = q("q111_order_shape_corr").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val c = r.getAs[Double]("r")
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12, s"corr out of range: $r")
    }
    val lq = rows.find(r => r.getAs[String]("var_a") == "lines" &&
      r.getAs[String]("var_b") == "quantity").get.getAs[Double]("r")
    assert(lq > 0.5, s"lines~quantity should be strongly positive, got $lq")
  }

  test("q112: the three effects bridge exactly to the revenue delta") {
    val rows = q("q112_price_volume_mix").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bridge = r.getAs[Double]("volume_effect") +
        r.getAs[Double]("mix_effect") + r.getAs[Double]("price_effect")
      assert(math.abs(bridge - r.getAs[Double]("delta")) < 1e-6,
        s"bridge $bridge != delta: $r")
    }
  }

  test("q113: the windowed skyline equals the naive dominance check") {
    val rows = q("q113_supplier_skyline").collect()
    assert(rows.nonEmpty)
    val pts = rows.map(r => (r.getAs[Long]("suppkey"),
      r.getAs[Long]("cost_milli"), r.getAs[Long]("lag_milli"),
      r.getAs[Boolean]("is_skyline")))
    assert(pts.exists(_._4), "skyline cannot be empty")
    pts.foreach { case (k, c, l, sky) =>
      val dominated = pts.exists { case (k2, c2, l2, _) =>
        k2 != k && c2 <= c && l2 <= l && (c2 < c || l2 < l) }
      assert(sky == !dominated, s"skyline flag wrong for supplier $k")
    }
  }

  test("d28: banding never over-counts, and the pigeonhole guarantee " +
    "holds exactly through radius 3") {
    val rows = q("d28_simhash_radius_sweep").collect().sortBy(_.getAs[Int]("r"))
    assert(rows.length == 9)
    var prevTrue = -1L
    rows.foreach { r =>
      val (rad, nt, nc) = (r.getAs[Int]("r"), r.getAs[Long]("n_true"),
        r.getAs[Long]("n_caught"))
      assert(nc <= nt, s"caught exceeds truth: $r")
      if (rad <= 3) assert(nc == nt,
        s"pigeonhole violated at r=$rad: caught $nc of $nt")
      assert(nt >= prevTrue, "true counts must be cumulative")
      prevTrue = nt
    }
  }

  test("q114: the register file is a legal HLL and the raw estimate " +
    "lands near the exact distinct") {
    val rows = q("q114_hll_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hit = r.getAs[Long]("n_buckets_hit")
      assert(hit >= 1L && hit <= 64L, s"register count out of range: $r")
      val est = r.getAs[Double]("hll_estimate")
      val exact = r.getAs[Long]("exact_distinct")
      assert(est > 0.0 && exact > 0L)
      // raw HLL at m=64 has sigma ~ 13%; 60% tolerance is a sanity
      // floor, not a precision claim (rel_err itself is in the output)
      assert(r.getAs[Double]("rel_err") < 0.6, s"estimate way off: $r")
    }
  }

  test("q115: backlog is non-negative, conserves the books, and ends " +
    "at opened-minus-closed") {
    val rows = q("q115_order_backlog_curve").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("backlog") >= 0L, s"$r"))
    val opened = rows.map(_.getAs[Long]("n_opened")).sum
    val closed = rows.map(_.getAs[Long]("n_closed")).sum
    val last = rows.maxBy(_.getAs[String]("dt"))
    assert(last.getAs[Long]("backlog") == opened - closed)
    val nOrders = graft.Tables.orders(spark, dir).count()
    assert(opened == nOrders)
  }

  test("q116: linear attribution conserves revenue against the raw " +
    "purchase total") {
    val rows = q("q116_linear_attribution").collect()
    assert(rows.nonEmpty)
    val credited = rows.map(_.getAs[Double]("revenue_credited")).sum
    val total = graft.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .agg(sum(round(col("value") * 100).cast("long")))
      .collect()(0).getLong(0) / 100.0
    // dsum rounds each credit at 6 dp — tolerance scales with rows
    assert(math.abs(credited - total) < 1e-3,
      s"credited $credited != purchases $total")
  }

  test("q117: percentile trend is internally ordered (p50 <= p90 <= max)") {
    val rows = q("q117_lag_percentile_trend").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90) = (r.getAs[Double]("p50"), r.getAs[Double]("p90"))
      assert(p50 <= p90 && p90 <= r.getAs[Long]("max_lag").toDouble, s"$r")
      assert(r.getAs[Long]("n") > 0L)
    }
  }

  test("q118: the outlier flag agrees with the reported z at the " +
    "2-sigma line, and the books balance") {
    val rows = q("q118_return_rate_outliers").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = r.getAs[Double]("z")
      assert(r.getAs[Boolean]("is_outlier") == (z * z > 4.0 - 1e-9) ||
        math.abs(z * z - 4.0) < 1e-9, s"flag/z disagree: $r")
      assert(r.getAs[Long]("k") <= r.getAs[Long]("n"))
    }
    // weighted mean of rates is the global rate (conservation)
    val n = rows.map(_.getAs[Long]("n")).sum.toDouble
    val k = rows.map(_.getAs[Long]("k")).sum.toDouble
    assert(math.abs(k / n - rows.head.getAs[Double]("global_rate")) < 1e-12)
  }

  test("e27: dimension profile is complete and each variance is " +
    "non-negative within the bounds") {
    val rows = q("e27_dim_profile").collect()
    assert(rows.map(_.getAs[Int]("dim")).sorted.sameElements(1 to 64))
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Double]("vmin"), r.getAs[Double]("vmax"))
      val mean = r.getAs[Double]("mean")
      assert(lo <= mean && mean <= hi, s"mean outside range: $r")
      assert(r.getAs[Double]("variance") >= -1e-9, s"negative var: $r")
    }
  }

  test("m15: clips are genuine runs — length >= 3, in-bounds starts, " +
    "and exact-duplicate media share a full-length clip") {
    val rows = q("m15_clip_reuse").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("clip_len") >= 3L, s"$r")
      assert(r.getAs[Long]("start_a") >= 0L && r.getAs[Long]("start_b") >= 0L)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
    // the corpus carries exact duplicate docs (d01's subject matter);
    // any such pair must surface as one diagonal-0 full clip
    val dups = graft.Tables.documents(spark, dir)
      .groupBy(col("text")).agg(collect_list(col("doc_id")).as("ids"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 2 && length(col("text")) >= 64 * 2 + 32)
      .collect()
    dups.headOption.foreach { dr =>
      val ids = dr.getAs[Seq[Long]]("ids").sorted
      val (a, b) = (ids(0), ids(1))
      assert(rows.exists(r => r.getAs[Long]("doc_a") == a &&
        r.getAs[Long]("doc_b") == b && r.getAs[Long]("start_a") == 0L),
        s"duplicate pair ($a,$b) missing its full clip")
    }
  }

  test("e28: every flagged vector is strictly under its own cell's cut, " +
    "and flags are a small tail") {
    val rows = q("e28_ood_screen").collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("ccos") < r.getAs[Double]("p05"), s"$r")
      assert(r.getAs[Long]("n_members") >= 1L)
    }
    // a p05 cut flags at most ~5% of each cell (interpolation slack)
    rows.groupBy(_.getAs[Long]("cell")).foreach { case (_, rs) =>
      val n = rs.head.getAs[Long]("n_members").toDouble
      assert(rs.length <= math.max(1, math.ceil(n * 0.05 + 1)),
        s"cell flags ${rs.length} of $n members")
    }
  }

  test("q119: key columns hold their FDs, non-keys violate, and the " +
    "books are consistent") {
    val rows = q("q119_fd_profile").collect()
    assert(rows.length == 6)
    def row(lhs: String) = rows.find(_.getAs[String]("lhs") == lhs).get
    assert(row("o_orderkey").getAs[Boolean]("fd_holds"))
    assert(row("c_custkey").getAs[Boolean]("fd_holds"))
    assert(!row("l_partkey").getAs[Boolean]("fd_holds"),
      "l_partkey -> l_suppkey should be violated on TPC-H-ish data")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_violating") <= r.getAs[Long]("n_groups"))
      assert(r.getAs[Boolean]("fd_holds") ==
        (r.getAs[Long]("n_violating") == 0L))
    }
  }

  test("simhash_agg equals the 60-column sign-sum formulation, " +
    "independent of partitioning") {
    import org.apache.spark.sql.functions.{sum => fsum}
    val words = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(split(trim(col("text")), " ")).as("w"))
      .withColumn("h",
        conv(substring(md5(encode(col("w"), "UTF-8")), 1, 15), 16, 10)
          .cast("long"))
    val naive = {
      val bitSums = (0 until 60).map(i =>
        fsum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0L, 1)
          .otherwise(-1)).as(s"b$i"))
      words.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
        .withColumn("simhash",
          (0 until 60).map(i =>
            when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
            .reduce((a, b) => a.bitwiseOR(b)))
        .select(col("doc_id"), col("simhash"))
    }
    val agg = words.repartition(7, col("w")) // force non-trivial merges
      .groupBy(col("doc_id"))
      .agg(graft.functions.SimHashFunctions.simhash(col("h"))
        .as("simhash"))
    assert(agg.join(naive, Seq("doc_id"))
      .filter(agg("simhash") =!= naive("simhash")).count() == 0L)
    assert(agg.count() > 0L)
  }

  test("q120: interpolated values are bracketed by their neighbours " +
    "and grid points never extrapolate") {
    val rows = q("q120_linear_interpolation").collect()
    assert(rows.nonEmpty)
    // every interpolated value lies inside the raw series' value range
    val mm = graft.Tables.events(spark, dir)
      .agg(min(col("value")), max(col("value"))).collect()(0)
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    rows.foreach { r =>
      val v = r.getAs[Double]("value_interp")
      assert(v >= lo - 1e-9 && v <= hi + 1e-9, s"out of range: $r")
    }
    // hour indices are strictly increasing per user (dense interior grid)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val hs = rs.map(_.getAs[Long]("hour_idx")).sorted
      assert(hs.distinct.length == hs.length)
    }
  }

  test("t35: shares sum to 1 on both sides, shifts sum to 0, and " +
    "kept never exceeds raw") {
    val rows = q("t35_dedup_mixture_shift").collect()
    assert(rows.nonEmpty)
    val (sr, sk, sh) = (rows.map(_.getAs[Double]("share_raw")).sum,
      rows.map(_.getAs[Double]("share_kept")).sum,
      rows.map(_.getAs[Double]("share_shift")).sum)
    assert(math.abs(sr - 1.0) < 1e-9 && math.abs(sk - 1.0) < 1e-9)
    assert(math.abs(sh) < 1e-9)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_raw"), s"$r")
      assert(r.getAs[Long]("tok_kept") <= r.getAs[Long]("tok_raw"), s"$r")
    }
  }

  test("q121: the migration matrix conserves the part population on " +
    "both margins") {
    val rows = q("q121_abc_migration").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_parts")).sum
    // every part that traded in either period appears exactly once
    val nParts = graft.Tables.lineitem(spark, dir)
      .select(col("l_partkey")).distinct().count()
    assert(total == nParts, s"matrix covers $total of $nParts parts")
    // 'N'→'N' is impossible (a part absent from both periods never
    // enters the matrix)
    assert(!rows.exists(r => r.getAs[String]("class_p1") == "N" &&
      r.getAs[String]("class_p2") == "N"))
  }

  test("m16: shard books reconcile — bytes and items sum across " +
    "shards, min <= mean <= max") {
    val rows = q("m16_shard_balance").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, mx) = (r.getAs[Long]("min_shard_bytes"),
        r.getAs[Long]("max_shard_bytes"))
      val mean = r.getAs[Double]("mean_shard_bytes")
      assert(mn <= mean + 1e-9 && mean <= mx + 1e-9, s"$r")
      assert(r.getAs[Long]("n_shards") >= 1L)
      assert(r.getAs[Long]("total_bytes") >= r.getAs[Long]("n_items"),
        "payloads are at least a byte each")
    }
  }

  test("d29: wider grams mean more distinct keys per posting and a " +
    "colder index") {
    val rows = q("d29_shingle_width_profile").collect()
      .sortBy(_.getAs[Int]("w"))
    assert(rows.map(_.getAs[Int]("w")).sameElements(Seq(2, 3, 5)))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct_grams") <=
        r.getAs[Long]("total_postings"))
      val share = r.getAs[Double]("hot_posting_share")
      assert(share >= 0.0 && share <= 1.0)
    }
    // key selectivity (distinct/postings) is monotone in width
    val sel = rows.map(r => r.getAs[Long]("n_distinct_grams").toDouble /
      r.getAs[Long]("total_postings"))
    assert(sel(0) <= sel(1) + 1e-12 && sel(1) <= sel(2) + 1e-12,
      s"selectivity not monotone: ${sel.toList}")
  }

  test("e29: probe cost grows monotonically with nprobe and never " +
    "exceeds the corpus") {
    val rows = q("e29_probe_cost").collect().sortBy(_.getAs[Int]("nprobe"))
    assert(rows.map(_.getAs[Int]("nprobe")).sameElements(Seq(1, 2, 4)))
    val n = graft.Tables.embeddings(spark, dir).count()
    var prev = 0.0
    rows.foreach { r =>
      val mean = r.getAs[Double]("mean_scanned")
      assert(mean >= prev, "cost must be monotone in nprobe")
      prev = mean
      assert(r.getAs[Long]("max_scanned") <= n)
      assert(r.getAs[Long]("n_queries") == n)
    }
  }

  test("q124: the weekly-merged registers equal the direct build and " +
    "reproduce q114's estimates exactly") {
    val rows = q("q124_hll_weekly_union").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("matches_direct"),
        s"two-level max diverged from direct registers: $r")
      assert(r.getAs[Long]("n_weeks") >= 1L)
    }
    val direct = q("q114_hll_distinct").collect()
      .map(r => r.getAs[String]("priority") ->
        r.getAs[Double]("hll_estimate")).toMap
    rows.foreach { r =>
      assert(r.getAs[Double]("hll_estimate") ==
        direct(r.getAs[String]("priority")),
        "merged estimate must be bit-identical to q114's direct one")
    }
  }

  test("t34: readability bands partition the non-empty docs") {
    val rows = q("t34_readability").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val parts = Seq("n_empty", "n_easy", "n_standard", "n_hard")
        .map(r.getAs[Long](_))
      assert(parts.forall(_ >= 0L) && parts.sum == n, s"bands leak: $r")
      assert(r.getAs[Long]("syllables") > 0L == (r.getAs[Long]("words") > 0L)
        || r.getAs[Long]("words") == 0L)
    }
  }

  test("q122: time-decay attribution conserves total purchase revenue " +
      "(same conservation law as q116's linear split — only the split " +
      "ratios differ)") {
    def credited(name: String): Double =
      q(name).agg(sum(col("revenue_credited"))).collect()(0).getDouble(0)
    val decayTotal = credited("q122_time_decay_attribution")
    val linearTotal = credited("q116_linear_attribution")
    // both schemes split the identical purchase set, so totals agree
    // to double round-off across the per-channel sums
    assert(math.abs(decayTotal - linearTotal) <
      1e-6 * math.max(1.0, math.abs(linearTotal)),
      s"decay=$decayTotal linear=$linearTotal")
  }

  test("q126 / hll_register_agg: the aggregate's register file is " +
      "bit-identical to q114's declarative group-by-bucket-max build, " +
      "independent of partitioning, and q126's estimate equals q114's") {
    graft.functions.GraftFunctions.register(spark)
    val h = conv(substring(
      md5(encode(col("o_custkey").cast("string"), "UTF-8")), 1, 15),
      16, 10).cast("long")
    val base = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("priority"), h.as("h"))
    // declarative registers, densified to the full 64-bucket file
    val declarative = base
      .withColumn("bucket", col("h").bitwiseAND(lit(63L)))
      .withColumn("w", shiftright(col("h"), 6))
      .withColumn("rho", when(col("w") === 0L, lit(55))
        .otherwise(lit(55) - length(bin(col("w")))))
      .groupBy(col("priority"), col("bucket"))
      .agg(max(col("rho")).as("m"))
      .collect().map(r => (r.getAs[String]("priority"),
        r.getAs[Long]("bucket").toInt) -> r.getAs[Int]("m")).toMap
    for (nPart <- Seq(1, 7, 32)) {
      val viaAgg = base.repartition(nPart)
        .groupBy(col("priority"))
        .agg(expr("hll_register_agg(h)").as("regs"))
        .collect().map(r => r.getAs[String]("priority") ->
          r.getSeq[Int](1)).toMap
      viaAgg.foreach { case (p, regs) =>
        assert(regs.length == 64)
        regs.zipWithIndex.foreach { case (m, b) =>
          assert(m == declarative.getOrElse((p, b), 0),
            s"priority=$p bucket=$b parts=$nPart")
        }
      }
    }
    // and the projected estimate agrees with q114's bit-for-bit
    val est114 = q("q114_hll_distinct").collect()
      .map(r => r.getAs[String]("priority") ->
        r.getAs[Double]("hll_estimate")).toMap
    q("q126_hll_agg").collect().foreach { r =>
      assert(r.getAs[Double]("hll_estimate") ==
        est114(r.getAs[String]("priority")))
    }
  }

  test("q127: the two-window CUSUM identity equals the recursive fold " +
      "max(0, S + y) it re-expresses declaratively") {
    val rows = q("q127_cusum_drift").collect().sortBy(_.getAs[String]("dt"))
    assert(rows.nonEmpty)
    val xs = rows.map(_.getAs[Long]("revenue_cents"))
    val n = xs.length.toLong
    val t = xs.sum
    var s = 0L
    rows.zip(xs).foreach { case (r, x) =>
      val y = 10L * n * x - 11L * t
      s = math.max(0L, s + y)
      assert(r.getAs[Double]("cusum_cents") == s.toDouble / (10.0 * n),
        s"dt=${r.getAs[String]("dt")}")
      assert(r.getAs[Boolean]("is_drift") == (s > 20L * t))
    }
  }

  test("t36: the KS statistic equals a driver-side two-sample model " +
      "per source (exact integer numerator, shared final division)") {
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = docs.length.toLong
    val values = docs.map(_._2).distinct.sorted
    val bySource = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val model = bySource.map { case (src, xs) =>
      val ns = xs.length.toLong
      val maxNum = values.map { v =>
        val cumS = xs.count(_ <= v).toLong
        val cumR = docs.count(_._2 <= v).toLong - cumS
        math.abs(cumS * (n - ns) - cumR * ns)
      }.max
      src -> (ns, maxNum.toDouble / (ns * (n - ns)).toDouble)
    }
    val rows = q("t36_ks_drift").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("ks_stat"))).toMap
    assert(rows == model, s"spark=$rows model=$model")
  }

  test("q125: BFS hop counts match a driver-side shortest-path model " +
      "on the sf0.001 co-purchase graph") {
    val rows = q("q125_khop_reachability").collect()
      .map(r => r.getAs[Int]("hop") -> r.getAs[Long]("n_nodes")).toMap
    // independent model: rebuild the edge list and run plain BFS
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    for ((_, parts) <- byOrder; a <- parts; b <- parts if a != b)
      adj(a) = adj(a) + b
    val seeds = adj.keySet.filter(_ % 200 == 0)
    var visited = seeds.map(_ -> 0).toMap
    var frontier = seeds.toSet
    for (h <- 1 to 3) {
      val next = frontier.flatMap(adj(_)) -- visited.keySet
      visited = visited ++ next.map(_ -> h)
      frontier = next
    }
    val model = visited.groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    assert(rows == model, s"spark=$rows model=$model")
  }
}
