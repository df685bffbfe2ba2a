package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariants of the wave-9 gates that the hash gate cannot express:
  * decomposition additivity, robust-statistic replay against plain Scala,
  * SRM margin consistency, referential-audit verdict branches, power-
  * iteration normalization/convergence, and the streaming late-data drop
  * accounting (watermark semantics, pinned against an in-Spark batch
  * recomputation rather than an invariant alone).
  */
class Wave9Spec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("ab_srm: arms partition the user population; flag consistent with chisq") {
    val r = run("ab_srm").collect().head
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    assert(r.getAs[Long]("k0") + r.getAs[Long]("k1") + r.getAs[Long]("k2") ==
      r.getAs[Long]("nt"))
    assert(r.getAs[Long]("nt") == users)
    val chisq = r.getAs[Double]("chisq")
    assert(chisq >= 0.0)
    assert(r.getAs[Long]("srm_flag") == (if (chisq > 13.8155) 1L else 0L))
  }

  test("ts_decompose: trend+seasonal+resid reassembles x; components exact") {
    val rows = run("ts_decompose").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val x = r.getAs[Long]("x").toDouble
      // trend carries the level; seasonal is the hour-of-day deviation
      // from the grand mean; resid is defined as the exact remainder
      val re = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("resid")
      assert(math.abs(re - x) < 1e-6, s"additivity at b=${r.getAs[Long]("b")}")
      assert(r.getAs[Long]("hod") == ((r.getAs[Long]("b") % 24) + 24) % 24)
      assert(r.getAs[Long]("tc") >= 1 && r.getAs[Long]("tc") <= 24)
    }
  }

  test("ts_anomaly: med/MAD match a plain-Scala replay; fence is strict") {
    val xs = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(rel.Q.tsBucket(col("ts"), 3600000000L).as("b"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getAs[Long]("b"), r.getAs[Long]("x")))
    def lowerMedianBy(vs: Array[(Long, Long)]): Long = {
      // rank selection at (N+1) div 2 ordered by (value, bucket) — the
      // same discrete lower median the gate computes in both engines
      val sorted = vs.sortBy(v => (v._2, v._1))
      sorted(((vs.length + 1) / 2) - 1)._2
    }
    val med = lowerMedianBy(xs)
    val mad = lowerMedianBy(xs.map { case (b, x) => (b, math.abs(x - med)) })
    val out = run("ts_anomaly").collect()
    for (r <- out) {
      assert(r.getAs[Long]("med") == med && r.getAs[Long]("mad") == mad)
      assert(r.getAs[Long]("dev") > 3 * mad)
      assert(r.getAs[Long]("dev") ==
        math.abs(r.getAs[Long]("x") - med))
    }
    val expected = xs.count { case (_, x) => math.abs(x - med) > 3 * mad }
    assert(out.length == expected, "every fence breach is reported")
  }

  test("dq_referential: intact FK proves zero; snapshot FK detects orphans") {
    val rows = run("dq_referential").collect()
      .map(r => r.getAs[String]("fk") -> r).toMap
    val intact = rows("lineitem.l_orderkey->orders")
    assert(intact.getAs[Long]("orphan_keys") == 0)
    assert(intact.getAs[Long]("first_orphan") == -1L)
    assert(intact.getAs[Double]("orphan_share") == 0.0)
    val snap = rows("orders.o_custkey->customer_snapshot")
    assert(snap.getAs[Long]("orphan_keys") > 0)
    assert(snap.getAs[Long]("first_orphan") % 10 == 3,
      "orphans are exactly the keys withheld from the snapshot")
    assert(snap.getAs[Double]("orphan_share") > 0.0 &&
      snap.getAs[Double]("orphan_share") < 1.0)
  }

  test("vec_pca_power: max-norm normalization exact; iteration converges") {
    val rows = run("vec_pca_power").collect()
    assert(rows.length == 64)
    val u2 = rows.map(r => r.getAs[Long]("dim") -> r.getAs[Long]("u2")).toMap
    val u3 = rows.map(r => r.getAs[Long]("dim") -> r.getAs[Long]("u3")).toMap
    for (u <- Seq(u2, u3)) {
      assert(u.values.map(math.abs).max == 1000000L,
        "the max-norm component is exactly 10^6 after normalization")
      assert(u.values.forall(v => math.abs(v) <= 1000000L))
    }
    // power iteration converges: successive directions align (cosine, up
    // to the sign flip an eigenvector is only defined modulo)
    val dot = (1L to 64L).map(d => u2(d).toDouble * u3(d)).sum
    val cos = math.abs(dot) / math.sqrt(
      u2.values.map(v => v.toDouble * v).sum *
        u3.values.map(v => v.toDouble * v).sum)
    // the synthetic embeddings are near-isotropic (narrow eigengap), so
    // per-iteration alignment improves slowly (~0.97 at sf0.01 too); the
    // bound pins "rotating toward a fixed direction", not the rate
    assert(cos > 0.95, s"u3 vs u2 alignment $cos")
  }

  test("st_late_data: drops exactly the late stratum, emits closed windows") {
    val out = run("st_late_data")
    val cLo = 1704326400000000L
    val kept = spark.read.parquet(s"$sf/events.parquet")
      .select(rel.Q.tsMicros(col("ts")).as("us"), col("event_type"))
      .filter(col("us") >= cLo)
    val wm = kept.agg(((floor(max("us") / 1000) - 3600000L) * 1000)
      .as("wm")).collect().head.getLong(0)
    val expect = kept
      .select(expr("us div 3600000000").as("hour"), col("event_type"))
      .groupBy("hour", "event_type").agg(count(lit(1)).as("n"))
      .filter((col("hour") + 1) * 3600000000L < wm)
    assert(out.count() == expect.count())
    assert(out.exceptAll(expect).isEmpty && expect.exceptAll(out).isEmpty,
      "streaming append output == batch windows closed before the final watermark")
    // and the late stratum really existed (the drop path was exercised)
    val late = spark.read.parquet(s"$sf/events.parquet")
      .filter(rel.Q.tsMicros(col("ts")) < cLo).count()
    assert(late > 0, "fixture must contain a late stratum")
  }
}
