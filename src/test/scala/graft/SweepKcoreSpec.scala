package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Differential + invariant tests for the sweep-line concurrency peak and
  * bounded k-core peeling.
  */
class SweepKcoreSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  test("rj_concurrency matches a brute-force sweep for every user") {
    val SPAN = 600000000000L
    val got = SparkEntry.queries("rj_concurrency")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val events = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "unix_micros(cast(ts AS timestamp)) * 1000 AS t")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got.keySet == events.keySet)
    for ((u, ts) <- events) {
      // brute force: at every open instant count intervals covering it
      val peak = ts.map(p => ts.count(t => t <= p && p < t + SPAN)).max
      assert(got(u) == (ts.length.toLong, peak.toLong),
        s"user $u: got ${got(u)}, want (${ts.length}, $peak)")
    }
  }

  test("q26_funnel matches a brute-force per-user stage walk") {
    val got = SparkEntry.queries("q26_funnel")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byUser = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "event_type", "unix_micros(cast(ts AS timestamp)) * 1000 AS t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    assert(got.keySet == byUser.keySet)
    for ((u, evs) <- byUser) {
      def first(tp: String): Option[Long] =
        evs.filter(_._2 == tp).map(_._3).sorted.headOption
      val stages = Seq("signup", "view", "click", "purchase").map(first)
      var reached = 0
      var prev = Long.MinValue
      var going = true
      for (t <- stages if going) t match {
        case Some(x) if x >= prev => reached += 1; prev = x
        case _ => going = false
      }
      assert(got(u) == reached, s"user $u: got ${got(u)}, want $reached")
    }
  }

  test("gr_kcore: survivors keep degree >= k measured among survivors' round") {
    val out = SparkEntry.queries("gr_kcore")(spark, sf).cache()
    try {
      assert(out.filter(col("deg") < 4).count() == 0)
      // the reported degree is measured among the PREVIOUS round's
      // survivors, so the true degree among final survivors can only be
      // <= deg; recompute and check the sandwich plus k-core soundness of
      // one more peel: no node's final-survivor degree exceeds deg
      val ed = spark.read.parquet(s"$sf/orders.parquet")
        .join(spark.read.parquet(s"$sf/lineitem.parquet")
          .filter(col("l_quantity") <= 2),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("a"),
          (col("l_suppkey") + lit(1000000L)).as("b")).distinct()
      val edges = ed.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(ed.select(col("b").as("src"), col("a").as("dst")))
      val alive = out.select("node")
      val recomputed = edges
        .join(alive, col("src") === col("node")).drop("node")
        .join(alive.withColumnRenamed("node", "node2"),
          col("dst") === col("node2"))
        .groupBy("src").agg(count(lit(1)).as("deg2"))
      assert(out.join(recomputed, col("node") === col("src"))
        .filter(col("deg2") > col("deg")).count() == 0,
        "degree among a SUBSET cannot exceed the reported degree")
      // all survivors are real graph nodes
      assert(out.join(edges.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti").count() == 0)
    } finally out.unpersist()
  }
}
