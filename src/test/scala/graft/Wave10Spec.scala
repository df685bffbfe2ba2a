package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariants for the round-8 waves (10+) beyond their hash gates:
  * closure properties replayed in-engine (CDC apply, Markov removal),
  * accounting identities (modularity, growth ledger, cohort LTV, RFM
  * mass), exactness under redelivery (bounded-state dedup, checkpoint
  * resume, chained stateful), discipline checks (outer-join nulls,
  * filtered-search predicates, Benford/ROUGE/clustering bounds, LSH
  * S-curve monotonicity), and streaming-vs-batch parity (HLL sketch).
  */
class Wave10Spec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q36_cdc_apply: feed replay recovers the day-25 snapshot exactly") {
    val applied = run("q36_cdc_apply")
    val direct = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), rel.Q.tsMicros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .filter(col("us") >= 1706227200000000L && col("us") < 1706313600000000L)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        max(struct(col("us"), col("event_id"), col("event_type"))).as("m"))
      .select(col("user_id"), col("n"), col("m.event_type").as("st"))
    assert(applied.exceptAll(direct).isEmpty &&
      direct.exceptAll(applied).isEmpty,
      "old snapshot + delta == new snapshot, row for row")
  }

  test("gr_modularity: degree and edge accounting identities hold") {
    val rows = run("gr_modularity").collect()
    assert(rows.nonEmpty)
    val m = rows.head.getAs[Long]("m")
    assert(rows.forall(_.getAs[Long]("m") == m))
    // every undirected edge contributes 2 to the degree total, and
    // intra-community edges cannot exceed the edge count
    assert(rows.map(_.getAs[Long]("dc")).sum == 2 * m)
    val ecSum = rows.map(_.getAs[Long]("ec")).sum
    assert(ecSum >= 0 && ecSum <= m)
    val q = rows.map(_.getAs[Double]("contrib")).sum
    assert(q > -0.5 && q <= 1.0, s"modularity $q outside its range")
  }

  test("st_dedup_within_wm: full-feed redelivery collapses to exactly-once") {
    val out = run("st_dedup_within_wm")
    val n = spark.read.parquet(s"$sf/events.parquet").count()
    assert(out.count() == n)
    assert(out.select("event_id").distinct().count() == n)
  }

  test("st_outer_join: matches equal the inner join; nulls are proven-unmatched") {
    val out = run("st_outer_join").persist()
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), rel.Q.tsMicros(col("ts")).as("us"),
        col("event_type"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us").as("click_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("us").as("purchase_us"))
    val inner = c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_us") >= col("click_us") &&
        col("purchase_us") <= col("click_us") + 600000000L)
      .select("user_id", "click_us", "purchase_us")
    val matched = out.filter(col("purchase_us").isNotNull)
    assert(matched.exceptAll(inner).isEmpty && inner.exceptAll(matched).isEmpty,
      "matched subset == batch inner join")
    // a null row means: no purchase existed in the window at all
    val nullRows = out.filter(col("purchase_us").isNull)
      .select("user_id", "click_us")
    assert(nullRows.join(inner, Seq("user_id", "click_us"), "left_semi")
      .isEmpty, "no null-emitted click also has a match")
    out.unpersist()
    ()
  }

  test("sq_rfm: segments partition users; frequency mass is conserved") {
    val rows = run("sq_rfm").collect()
    val ev = spark.read.parquet(s"$sf/events.parquet")
    assert(rows.map(_.getAs[Long]("n_users")).sum ==
      ev.select("user_id").distinct().count())
    assert(rows.map(_.getAs[Long]("sum_f")).sum == ev.count())
  }

  test("ft_leakage_audit: counts bounded; the naive join provably leaks") {
    val rows = run("ft_leakage_audit").collect()
    val purchases = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_labels")).sum == purchases)
    for (r <- rows) {
      assert(r.getAs[Long]("n_pit") <= r.getAs[Long]("n_labels"))
      assert(r.getAs[Long]("n_leaky") <= r.getAs[Long]("n_labels"))
      val share = r.getAs[Double]("leak_share")
      assert(share >= 0.0 && share <= 1.0)
    }
    assert(rows.map(_.getAs[Long]("n_leaky")).sum > 0,
      "the naive latest-overall join must read the future somewhere")
  }

  test("km_assign_quality: partitions agree with km_cluster; margins non-negative") {
    val q = run("km_assign_quality").collect()
      .map(r => r.getAs[Long]("cluster") -> r).toMap
    val census = run("km_cluster").collect()
      .map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("n")).toMap
    assert(q.keySet == census.keySet)
    for ((c, r) <- q) {
      assert(r.getAs[Long]("n") == census(c),
        s"cluster $c size disagrees with the argmin census")
      assert(r.getAs[Long]("sse") >= 0)
      assert(r.getAs[Long]("margin_min") >= 0,
        "runner-up distance can never beat the argmin")
      assert(r.getAs[Long]("margin_sum") >= r.getAs[Long]("margin_min"))
    }
  }

  test("ann_filtered: every neighbor satisfies the metadata predicate") {
    val out = run("ann_filtered")
    val nonEn = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("lang") =!= "en").select(col("doc_id").as("id_n"))
    assert(out.join(nonEn, Seq("id_n"), "left_anti").isEmpty,
      "a neighbor escaped the pre-filter")
    // exact recall over the filtered stratum: per query, rn runs 1..k
    assert(out.groupBy("id_q").agg(max("rn").as("k"), count(lit(1)).as("c"))
      .filter(col("k") =!= col("c")).isEmpty)
  }

  test("q38_window_distinct: per-user running distinct is monotone, bounded") {
    val types = spark.read.parquet(s"$sf/events.parquet")
      .select("event_type").distinct().count()
    val bad = run("q38_window_distinct")
      .groupBy("user_id").agg(min("nd_types").as("lo"), max("nd_types").as("hi"))
      .filter(col("lo") < 1 || col("hi") > types)
    assert(bad.isEmpty)
  }

  test("src_csv_permissive: captures exactly the injected corrupt lines") {
    val out = run("src_csv_permissive")
    val corrupt = out.filter(col("et") === "_corrupt").collect()
    assert(corrupt.length == 1 && corrupt.head.getAs[Long]("n") == 7)
    assert(corrupt.head.isNullAt(corrupt.head.fieldIndex("bucket")))
    val good = out.filter(col("et") =!= "_corrupt")
      .agg(sum("n")).collect().head.getLong(0)
    assert(good == spark.read.parquet(s"$sf/events.parquet").count(),
      "permissive mode must keep every good row")
  }

  test("vec_matryoshka: overlap bounded by k; top-1 ids come from the corpus") {
    val rows = run("vec_matryoshka").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val ov = r.getAs[Long]("n_overlap")
      assert(ov >= 0 && ov <= 5)
      assert(r.getAs[Long]("full_top1") != r.getAs[Long]("id_q"))
      assert(r.getAs[Long]("pre_top1") != r.getAs[Long]("id_q"))
    }
  }

  test("geo_knn_join: one nearest site per point, consistent with the radius join") {
    val knn = run("geo_knn_join").persist()
    assert(knn.groupBy("pt_id").count().filter(col("count") > 1).isEmpty)
    val radius = run("geo_radius_join")
      .groupBy("pt_id").agg(min("dist2").as("best"))
    val joined = knn.join(radius, "pt_id")
    assert(joined.filter(col("dist2") =!= col("best")).isEmpty,
      "knn must pick exactly the radius join's per-point minimum")
    assert(knn.count() == radius.count())
    knn.unpersist()
    ()
  }

  test("ab_halfsample_ci: 32 samples, each roughly half, ranks a permutation") {
    val rows = run("ab_halfsample_ci").collect()
    assert(rows.length == 32)
    val total = spark.read.parquet(s"$sf/events.parquet").count()
    for (r <- rows) {
      val n = r.getAs[Long]("n_b")
      assert(n > total / 4 && n < 3 * total / 4, s"sample $n not near half of $total")
    }
    assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to 32L).toSeq)
  }

  test("sq_markov_removal: plain-Scala value-iteration replay matches exactly") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val o = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), rel.Q.tsMicros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .withColumn("prev", lag("event_type", 1).over(w))
      .withColumn("rn", row_number().over(w))
    val mapped = when(col("event_type") === "purchase", "conv")
      .otherwise(col("event_type"))
    val tm = o.filter(col("prev").isNotNull && col("prev") =!= "purchase")
      .select(col("prev"), mapped.as("next"))
      .unionByName(o.filter(col("rn") === 1)
        .select(lit("START").as("prev"), mapped.as("next")))
      .groupBy("prev", "next").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nFrom = tm.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._3).sum }
    val states = (tm.map(_._1) ++ tm.map(_._2)).distinct
    def replay(drop: Option[String]): Long = {
      val t = tm.filter { case (p, n, _) => !drop.contains(p) && !drop.contains(n) }
      var r = states.map(s => s -> (if (s == "conv") 1000000000L else 0L)).toMap
      for (_ <- 1 to 4) {
        r = states.map { s =>
          s -> (if (s == "conv") 1000000000L
                else {
                  val num = t.filter(_._1 == s).map { case (_, nx, n) => n * r(nx) }.sum
                  if (num == 0L) 0L else num / nFrom(s)
                })
        }.toMap
      }
      r("START")
    }
    val got = run("sq_markov_removal").collect()
      .map(r => r.getAs[String]("variant") -> r.getAs[Long]("reach_ppb")).toMap
    assert(got("full") == replay(None))
    for (c <- Seq("view", "click", "signup", "error"))
      assert(got(s"no_$c") == replay(Some(c)), s"variant no_$c diverges")
    assert(Seq("view", "click", "signup", "error")
      .forall(c => got(s"no_$c") <= got("full")),
      "removing a channel can never increase reach")
  }

  test("sq_lifecycle: growth-accounting identities hold day over day") {
    val rows = run("sq_lifecycle").collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[String]("state")) ->
        r.getAs[Long]("n")).toMap
    def g(d: Long, s: String) = rows.getOrElse((d, s), 0L)
    val days = rows.keys.map(_._1).toSeq.distinct.sorted
    assert(Set("new", "retained", "resurrected").subsetOf(
      rows.keys.map(_._2).toSet), "fixture must exercise the state space")
    def active(d: Long) = g(d, "new") + g(d, "retained") + g(d, "resurrected")
    for (d <- days.drop(1) if rows.keys.exists(_._1 == d - 1)) {
      assert(g(d, "churned") == active(d - 1) - g(d, "retained"),
        s"churn ledger broken at day $d")
    }
  }

  test("px_regionprops: areas partition the tile pixels; centroid inside bbox") {
    val rows = run("px_regionprops").collect()
    val total = rel.RelabelRel.pixels(spark, sf).count()
    assert(rows.map(_.getAs[Long]("area")).sum == total,
      "region areas must partition the pixel relation")
    for (r <- rows) {
      val (y0, y1) = (r.getAs[Long]("y0"), r.getAs[Long]("y1"))
      val (x0, x1) = (r.getAs[Long]("x0"), r.getAs[Long]("x1"))
      assert(r.getAs[Double]("cy") >= y0 && r.getAs[Double]("cy") <= y1)
      assert(r.getAs[Double]("cx") >= x0 && r.getAs[Double]("cx") <= x1)
      val ext = r.getAs[Double]("extent")
      assert(ext > 0.0 && ext <= 1.0)
      assert(r.getAs[Long]("area") <= (y1 - y0 + 1) * (x1 - x0 + 1))
    }
  }

  test("tx_rouge: recalls bounded; clipped matches never exceed reference mass") {
    val rows = run("tx_rouge").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("match1") <= r.getAs[Long]("ref_total1"))
      assert(r.getAs[Long]("match2") <= r.getAs[Long]("ref_total2"))
      assert(r.getAs[Double]("rouge1") >= 0.0 && r.getAs[Double]("rouge1") <= 1.0)
      assert(r.getAs[Double]("rouge2") >= 0.0 && r.getAs[Double]("rouge2") <= 1.0)
    }
  }

  test("dq_benford: digits partition, shares and expectations each sum to 1") {
    val rows = run("dq_benford").collect()
    assert(rows.map(_.getAs[Long]("d1")).sorted.toSeq == (1L to 9L).toSeq)
    val nt = rows.head.getAs[Long]("nt")
    assert(rows.map(_.getAs[Long]("n_d")).sum == nt)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_.getAs[Double]("benford_p")).sum - 1.0) < 1e-12)
    assert(rows.forall(_.getAs[Double]("chi_term") >= 0.0))
  }

  test("gr_clustering: coefficient in [0,1]; triangles close existing wedges") {
    val r = run("gr_clustering").collect().head
    val (tri, wed) = (r.getAs[Long]("n_tri"), r.getAs[Long]("n_wedges"))
    assert(3 * tri <= wed, "each triangle contributes 3 closed wedges")
    val c = r.getAs[Double]("c_global")
    assert(c >= 0.0 && c <= 1.0)
    assert(r.getAs[Long]("n_edges") > 0 && r.getAs[Long]("n_nodes") > 0)
  }

  test("dd_lsh_tuning: the banding S-curve is monotone in both directions") {
    val rows = run("dd_lsh_tuning").collect()
      .map(r => r.getAs[String]("cfg") -> r).toMap
    assert(rows.keySet == Set("b8r1", "b4r2", "b2r4"))
    // more, narrower bands => more candidates and no worse recall
    assert(rows("b8r1").getAs[Long]("n_pairs") >=
      rows("b4r2").getAs[Long]("n_pairs"))
    assert(rows("b4r2").getAs[Long]("n_pairs") >=
      rows("b2r4").getAs[Long]("n_pairs"))
    assert(rows("b8r1").getAs[Long]("n_twin") >=
      rows("b4r2").getAs[Long]("n_twin"))
    assert(rows("b4r2").getAs[Long]("n_twin") >=
      rows("b2r4").getAs[Long]("n_twin"))
    for (r <- rows.values)
      assert(r.getAs[Long]("n_twin") <= r.getAs[Long]("n_planted"))
  }

  test("sq_cohort_ltv: cumulative revenue is monotone and conserves mass") {
    val rows = run("sq_cohort_ltv").collect()
    val byCohort = rows.groupBy(_.getAs[Long]("cohort"))
    for ((_, rs) <- byCohort) {
      val ordered = rs.sortBy(_.getAs[Long]("age"))
      val cums = ordered.map(_.getAs[Long]("cum_rev"))
      assert(cums.zip(cums.drop(1)).forall { case (a, b) => b >= a })
      assert(cums.last == ordered.map(_.getAs[Long]("rev")).sum)
    }
    val mass = spark.read.parquet(s"$sf/events.parquet")
      .agg(sum(expr("CAST(round(value * 1000000) AS BIGINT)")))
      .collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("rev")).sum == mass,
      "per-(cohort, age) revenue partitions the event mass")
  }

  test("st_checkpoint_resume: the restarted incarnation neither drops nor doubles") {
    val agg = run("st_checkpoint_resume")
    val events = spark.read.parquet(s"$sf/events.parquet")
    assert(agg.agg(sum("n")).collect().head.getLong(0) == events.count(),
      "two incarnations over one checkpoint must cover the relation exactly once")
    val mass = events
      .agg(sum(expr("CAST(round(value * 1000000) AS BIGINT)")))
      .collect().head.getLong(0)
    assert(agg.agg(sum("sum_qv")).collect().head.getLong(0) == mass)
  }

  test("px3_regionprops: volumes partition the voxels; centroids inside boxes") {
    val rows = run("px3_regionprops").collect()
    val voxels = rel.Relabel3Rel.pixels3(spark, sf)
      .select("gz", "gy", "gx", "pz", "py", "px").distinct().count()
    assert(rows.map(_.getAs[Long]("volume")).sum == voxels)
    for (r <- rows) {
      assert(r.getAs[Double]("cz") >= r.getAs[Long]("z0") &&
        r.getAs[Double]("cz") <= r.getAs[Long]("z1"))
      val ext = r.getAs[Double]("extent")
      assert(ext > 0.0 && ext <= 1.0)
    }
  }

  test("st_chained_stateful: emitted windows are exactly-once and subset-closed") {
    val out = run("st_chained_stateful").persist()
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(rel.Q.tsMicros(col("ts")).as("us"), col("event_type"))
    val wm = ev.agg(((floor(max("us") / 1000) - 1296000000L) * 1000)
      .as("wm")).collect().head.getLong(0)
    val expect = ev
      .select(expr("us div 3600000000").as("hour"), col("event_type"))
      .groupBy("hour", "event_type").agg(count(lit(1)).as("n"))
      .filter((col("hour") + 1) * 3600000000L < wm)
    assert(out.exceptAll(expect).isEmpty && expect.exceptAll(out).isEmpty,
      "dedup must collapse the redelivery and the watermark must close " +
        "exactly the oracle's window set")
    out.unpersist()
    ()
  }

  test("sq_stickiness: DAU never exceeds MAU; ratio in (0, 1]") {
    val rows = run("sq_stickiness").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("mau"),
        "a daily active is by definition a 30-day active")
      val st = r.getAs[Double]("stickiness")
      assert(st > 0.0 && st <= 1.0)
    }
  }

  test("tx_decontam_sweep: contamination is monotone non-increasing in n") {
    val rows = run("tx_decontam_sweep").collect()
      .map(r => r.getAs[Long]("n") -> r).toMap
    assert(rows.keySet == Set(4L, 8L, 13L))
    assert(rows(4L).getAs[Long]("n_pairs") >= rows(8L).getAs[Long]("n_pairs"))
    assert(rows(8L).getAs[Long]("n_pairs") >= rows(13L).getAs[Long]("n_pairs"))
    for (r <- rows.values)
      assert(r.getAs[Long]("n_contam_docs") <= r.getAs[Long]("n_pairs"))
  }

  test("st_sk_hll: streaming register table equals the batch sketch") {
    val stream = run("st_sk_hll")
    val batch = run("sk_hll_users")
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty,
      "4-batch arbitrary-order merge == single-pass batch sketch")
  }
}
