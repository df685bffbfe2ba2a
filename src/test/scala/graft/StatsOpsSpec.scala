package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Statistical invariants of the experiment / time-series gates — the
  * properties a hash match against the oracle cannot express: conservation
  * (attribution credit sums to the conversion count), boundedness (chi-square
  * non-negative, |r| ≤ 1, EWMA inside the value range), and contingency-table
  * consistency.
  */
class StatsOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("ab_chisq: one row, consistent margins, non-negative statistic") {
    val r = run("ab_chisq").collect().head
    val (n0, n1, n2) = (r.getAs[Long]("n0"), r.getAs[Long]("n1"), r.getAs[Long]("n2"))
    val (c0, c1, c2) = (r.getAs[Long]("c0"), r.getAs[Long]("c1"), r.getAs[Long]("c2"))
    assert(r.getAs[Long]("nt") == n0 + n1 + n2)
    assert(r.getAs[Long]("ct") == c0 + c1 + c2)
    assert(c0 <= n0 && c1 <= n1 && c2 <= n2)
    assert(r.getAs[Long]("ct") > 0 && r.getAs[Long]("ct") < r.getAs[Long]("nt"),
      "conversion must split the table or the test is degenerate")
    assert(r.getAs[Double]("chisq") >= 0.0)
  }

  test("ab_welch: moment inequalities hold and df is within its bounds") {
    val r = run("ab_welch").collect().head
    val (n0, n1) = (r.getAs[Long]("n0"), r.getAs[Long]("n1"))
    // Cauchy–Schwarz: n·Σx² ≥ (Σx)² — equivalently the variance is ≥ 0
    assert(n0 * r.getAs[Double]("s20") >= r.getAs[Double]("s10") * r.getAs[Double]("s10"))
    assert(n1 * r.getAs[Double]("s21") >= r.getAs[Double]("s11") * r.getAs[Double]("s11"))
    val df = r.getAs[Double]("df_welch")
    // Welch df lies between min(n0,n1)-1 and n0+n1-2
    assert(df >= (math.min(n0, n1) - 1).toDouble - 1e-9)
    assert(df <= (n0 + n1 - 2).toDouble + 1e-9)
  }

  test("ts_autocorr: six lags, |r| <= 1, pair counts bounded by the series") {
    val rows = run("ts_autocorr").collect().sortBy(_.getAs[Long]("lag"))
    assert(rows.map(_.getAs[Long]("lag")).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val nBuckets = spark.read.parquet(s"$sf/events.parquet")
      .select(rel.Q.tsBucket(col("ts"), 300000000L)).distinct().count()
    for (r <- rows) {
      assert(math.abs(r.getAs[Double]("r")) <= 1.0 + 1e-12)
      // every pair consumes a distinct left endpoint, so a lag can pair at
      // most nBuckets - 1 of them (gaps mean counts need NOT shrink with lag)
      assert(r.getAs[Long]("np") > 0 && r.getAs[Long]("np") <= nBuckets - 1)
    }
  }

  test("ts_ewma: one row per user with >=8 events, value inside global range") {
    val out = run("ts_ewma")
    assert(out.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    val mm = spark.read.parquet(s"$sf/events.parquet")
      .agg(min("value"), max("value")).collect().head
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    for (r <- out.collect())
      assert(r.getAs[Double]("ewma") >= lo - 1e-6 && r.getAs[Double]("ewma") <= hi + 1e-6,
        "a convex combination of values cannot leave their range")
  }

  test("sq_attribution: credit conservation across channels") {
    val rows = run("sq_attribution").collect()
    val firstTot = rows.map(_.getAs[Long]("first_n")).sum
    val lastTot = rows.map(_.getAs[Long]("last_n")).sum
    // every attributed conversion has exactly one first and one last touch
    assert(firstTot == lastTot)
    assert(firstTot > 0)
    // linear credit: each conversion contributes k·(1000000 div k) ppm —
    // i.e. 1e6 minus an integer-division remainder < k per conversion
    val ppmTot = rows.map(_.getAs[Long]("linear_ppm")).sum
    val maxTouchesPerConv = 64L // generous bound for the remainder argument
    assert(ppmTot <= 1000000L * firstTot)
    assert(ppmTot > 1000000L * firstTot - firstTot * maxTouchesPerConv)
  }

  test("tx_collocations: exactly the top-50, lift consistent with counts") {
    val rows = run("tx_collocations").collect()
    assert(rows.length == 50)
    for (r <- rows) {
      assert(r.getAs[Long]("n_xy") >= 5)
      val lift = r.getAs[Double]("lift")
      val expect = r.getAs[Long]("n_xy").toDouble * r.getAs[Long]("n_big") /
        (r.getAs[Long]("n_x").toDouble * r.getAs[Long]("n_y"))
      assert(math.abs(lift - expect) <= math.ulp(expect) * 4)
      // a bigram can never outnumber either of its unigrams
      assert(r.getAs[Long]("n_xy") <= r.getAs[Long]("n_x"))
      assert(r.getAs[Long]("n_xy") <= r.getAs[Long]("n_y"))
    }
    val lifts = rows.map(_.getAs[Double]("lift"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => b <= a },
      "results must arrive lift-descending")
  }

  test("ab_cuped: theta is the OLS slope and the reduction is a valid ratio") {
    val r = run("ab_cuped").collect().head
    val (n, sx, sxx) = (r.getAs[Long]("n"), r.getAs[Long]("sx"), r.getAs[Long]("sxx"))
    val (sy, syy, sxy) = (r.getAs[Long]("sy"), r.getAs[Long]("syy"), r.getAs[Long]("sxy"))
    assert(n * sxx >= sx * sx, "var(x) >= 0")
    assert(n * syy >= sy * sy, "var(y) >= 0")
    val theta = r.getAs[Double]("theta")
    assert(theta == (n.toDouble * sxy - sx.toDouble * sy) / (n.toDouble * sxx - sx.toDouble * sx))
    // reduction = corr(x,y)^2, so it must land in [0, 1]
    val red = r.getAs[Double]("var_reduction")
    assert(red >= 0.0 && red <= 1.0 + 1e-12)
    assert(r.getAs[Long]("n0") > 0 && r.getAs[Long]("n0") < n)
  }

  test("ts_backtest: five types, WAPE ratios recompute from exact parts") {
    val rows = run("ts_backtest").collect()
    assert(rows.length == 5)
    for (r <- rows) {
      assert(r.getAs[Long]("act_w") > 0 && r.getAs[Long]("act_d") > 0)
      assert(r.getAs[Double]("wape_weekly") ==
        r.getAs[Long]("err_w").toDouble / r.getAs[Long]("act_w"))
      assert(r.getAs[Double]("wape_daily") ==
        r.getAs[Long]("err_d").toDouble / r.getAs[Long]("act_d"))
      assert(r.getAs[Double]("wape_weekly") >= 0.0)
    }
  }

  test("dq_skew: histogram partitions the key set and bounds are honest") {
    val rows = run("dq_skew").collect()
    val totKeys = rows.head.getAs[Long]("tot_keys")
    val totRows = rows.head.getAs[Long]("tot_rows")
    assert(rows.map(_.getAs[Long]("n_keys")).sum == totKeys)
    assert(rows.map(_.getAs[Long]("rows_in")).sum == totRows)
    for (r <- rows) {
      val b = r.getAs[Long]("log2_n")
      val lo = 1L << b; val hi = (1L << (b + 1)) - 1
      assert(r.getAs[Long]("min_n") >= lo && r.getAs[Long]("max_n") <= hi,
        s"bucket $b must contain only counts in [$lo, $hi]")
    }
    val hhi = rows.head.getAs[Double]("hhi")
    assert(hhi >= 1.0 / totKeys - 1e-12 && hhi <= 1.0)
    assert(rows.head.getAs[Double]("top1_share") * totKeys >= 1.0 - 1e-9,
      "the hottest key is at least the average key")
  }

  test("sq_funnel_time: quantiles ordered, deltas causal") {
    val rows = run("sq_funnel_time").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (p50, p90) = (r.getAs[Long]("p50_us"), r.getAs[Long]("p90_us"))
      assert(p50 >= 0, "a conversion cannot precede its click")
      assert(p50 <= p90, "discrete quantiles must be ordered")
      assert(r.getAs[Long]("n_conv") > 0)
    }
  }

  test("st_ab_cells: conv cell is a subset of the all cell per arm") {
    val rows = run("st_ab_cells").collect()
    val byArm = rows.groupBy(_.getAs[Long]("arm"))
    assert(byArm.keySet == Set(0L, 1L, 2L))
    for ((_, rs) <- byArm) {
      val m = rs.map(r => r.getAs[String]("kind") -> r.getAs[Long]("n_users")).toMap
      assert(m("conv") <= m("all"))
      assert(m("conv") > 0 && m("all") > 0)
    }
  }

  test("ts_changepoint: the break splits the series with consistent means") {
    val r = run("ts_changepoint").collect().head
    val (t, tt, ss) = (r.getAs[Long]("t"), r.getAs[Long]("tt"), r.getAs[Long]("ss"))
    assert(t >= 1 && t < tt, "break must fall strictly inside the series")
    val (pre, post) = (r.getAs[Double]("mean_pre"), r.getAs[Double]("mean_post"))
    // dev = t*tt*(mean_pre - S/T) => sign of dev matches pre-vs-global mean
    val dev = r.getAs[Long]("dev")
    assert((dev > 0) == (pre > ss.toDouble / tt) || dev == 0)
    assert(pre > 0 && post > 0)
  }

  test("vec_gram: full upper triangle with PSD-consistent diagonal") {
    val rows = run("vec_gram").collect()
    assert(rows.length == 64 * 65 / 2)
    val n = rows.head.getAs[Long]("n")
    for (r <- rows) {
      assert(r.getAs[Long]("n") == n, "every cell sums the same row count")
      assert(r.getAs[Long]("i") <= r.getAs[Long]("j"))
      if (r.getAs[Long]("i") == r.getAs[Long]("j")) {
        assert(r.getAs[Long]("s_ij") >= 0, "diagonal is a sum of squares")
        assert(r.getAs[Long]("cov_num") >= 0,
          "n*Σq² - (Σq)² is n²·variance, necessarily non-negative")
      }
    }
  }

  test("vec_gram: accumulator cells equal brute-force sums over the corpus") {
    // differential guard for the r9 per-partition d² accumulator: every
    // (i, j, s_ij) must equal the naive per-vector product sum computed
    // independently here (the oracle pins this too, but only through the
    // full query — this isolates the accumulator's stride/index math)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv")
      .collect().map(_.getSeq[Long](0).toArray)
    val expected = Array.ofDim[Long](64, 64)
    vecs.foreach { v =>
      var i = 0
      while (i < 64) {
        var j = i
        while (j < 64) { expected(i)(j) += v(i) * v(j); j += 1 }
        i += 1
      }
    }
    val got = run("vec_gram").collect()
    assert(got.length == 64 * 65 / 2)
    for (r <- got) {
      val (i, j) = (r.getAs[Long]("i").toInt - 1, r.getAs[Long]("j").toInt - 1)
      assert(r.getAs[Long]("s_ij") == expected(i)(j),
        s"cell ($i, $j) diverges from the brute-force sum")
      assert(r.getAs[Long]("n") == vecs.length)
    }
  }

  test("dq_gaps: islands are well-formed outage windows") {
    val rows = run("dq_gaps").collect()
    assert(rows.nonEmpty, "the sparse sf0.001 feed must have hourly gaps")
    for (r <- rows) {
      assert(r.getAs[Long]("gap_len") ==
        r.getAs[Long]("gap_end") - r.getAs[Long]("gap_start") + 1,
        "a gap is a contiguous bucket run")
    }
    // gaps of one type never overlap
    for ((_, rs) <- rows.groupBy(_.getAs[String]("event_type"))) {
      val sorted = rs.sortBy(_.getAs[Long]("gap_start"))
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray) if sorted.length > 1)
        assert(a.getAs[Long]("gap_end") < b.getAs[Long]("gap_start"))
    }
  }

  test("ft_kfold: grouped split — no user straddles folds, events conserved") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    // the property a hash match can't see: fold is a function of the USER,
    // so recomputing it per-event must give one fold per user
    val perEvent = events.filter(col("user_id").isNotNull)
      .withColumn("fold", expr(
        rel.CurationOps.bucket("user_id") + " % 5"))
    assert(perEvent.groupBy("user_id")
      .agg(countDistinct("fold").as("nf"))
      .filter(col("nf") =!= 1).count() == 0,
      "grouped k-fold: every user's events land in exactly one fold")
    val rows = run("ft_kfold").collect()
    assert(rows.forall { r =>
      r.isNullAt(r.fieldIndex("fold")) ||
        (0 until 5).contains(r.getAs[Int]("fold"))
    })
    assert(rows.map(_.getAs[Long]("n_events")).sum == events.count())
    assert(rows.map(_.getAs[Long]("n_users")).sum ==
      events.filter(col("user_id").isNotNull)
        .select("user_id").distinct().count(),
      "grouped split: fold user counts partition the user set")
  }

  test("ft_target_encode: OOF complement excludes exactly the own fold") {
    val rows = run("ft_target_encode").collect()
    for ((_, rs) <- rows.groupBy(_.getAs[String]("source"))) {
      val totN = rs.map(_.getAs[Long]("n_in")).sum
      val totC = rs.map(_.getAs[Long]("c_in")).sum
      for (r <- rs) {
        assert(r.getAs[Long]("n_oof") == totN - r.getAs[Long]("n_in"))
        assert(r.getAs[Long]("c_oof") == totC - r.getAs[Long]("c_in"))
        val enc = r.getAs[Double]("enc_smooth")
        assert(enc > 0.0 && enc < 1.0,
          "smoothing keeps the encoding strictly inside (0,1)")
      }
    }
  }

  test("ab_bayes: conjugate posterior moments are consistent") {
    for (r <- run("ab_bayes").collect()) {
      val (n, c) = (r.getAs[Long]("n"), r.getAs[Long]("c"))
      val mean = r.getAs[Double]("post_mean")
      assert(math.abs(mean - (1.0 + c) / (2.0 + n)) < 1e-12,
        "Beta(1,1) posterior mean is (1+c)/(n+2)")
      assert(r.getAs[Double]("post_var") > 0.0)
      assert(r.getAs[Double]("ci_lo") < mean && mean < r.getAs[Double]("ci_hi"))
      // the normal approximation stays inside the variance envelope
      assert(math.abs(r.getAs[Double]("ci_hi") - r.getAs[Double]("ci_lo") -
        2 * 1.96 * math.sqrt(r.getAs[Double]("post_var"))) < 1e-12)
    }
  }

  test("dq_ldiv: every flagged class is genuinely below l = 3") {
    val flagged = run("dq_ldiv")
    assert(flagged.filter(col("l_div") >= 3).count() == 0)
    // cross-check one flagged class against a direct distinct count
    flagged.limit(1).collect().headOption.foreach { r =>
      val direct = spark.read.parquet(s"$sf/events.parquet")
        .filter(col("user_id") === r.getAs[Long]("user_id") &&
          rel.Q.tsBucket(col("ts"), 86400000000L) === r.getAs[Long]("day"))
        .select("event_type").distinct().count()
      assert(direct == r.getAs[Long]("l_div"))
    }
  }
}
