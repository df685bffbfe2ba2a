package graft

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force differentials for the round-6 time-series resample and the
  * link-prediction scores — the hash-vs-DuckDB gate is the driver's; these
  * recompute both results in plain Scala over all of sf0.001.
  */
class ResampleLinkpredSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("aj_resample agrees with a per-grid-point brute force over sf0.001") {
    val HOUR = 3600L * 1000000000L
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .filter("user_id IS NOT NULL")
      .selectExpr("user_id", "unix_micros(cast(ts AS timestamp)) * 1000 AS t", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // per (user, instant): max value, mirroring the query's instant dedup
    val byInstant = ev.groupBy(t => (t._1, t._2))
      .map { case ((u, t), rs) => (u, t, rs.map(_._3).max) }.toArray
    val h0 = ev.map(_._2).min / HOUR * HOUR
    val h1 = ev.map(_._2).max / HOUR * HOUR
    val users = ev.map(_._1).distinct
    val want = (for {
      u <- users
      gt <- h0 to h1 by HOUR
    } yield {
      val mine = byInstant.filter(_._1 == u)
      val atOrBefore = mine.filter(_._2 <= gt)
      val fill =
        if (atOrBefore.isEmpty) None
        else Some(atOrBefore.maxBy(_._2)._3)
      val n1h = mine.count(e => e._2 > gt - HOUR && e._2 <= gt)
      (u, gt) -> ((fill, n1h.toLong))
    }).toMap
    val got = q("aj_resample").collect().map { r =>
      (r.getLong(0), r.getLong(1)) ->
        ((if (r.isNullAt(2)) None else Some(r.getDouble(2))), r.getLong(3))
    }.toMap
    assert(got.size == want.size, s"${got.size} grid rows vs ${want.size}")
    assert(got == want)
    // the grid must contain both filled and yet-unfilled (null) points,
    // and at least one point with a non-zero trailing-hour count
    assert(got.values.exists(_._1.isEmpty) && got.values.exists(_._1.nonEmpty))
    assert(got.values.exists(_._2 > 0L))
  }

  test("gr_linkpred agrees with in-memory neighbor-set scoring over sf0.001") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter("l_quantity <= 2").selectExpr("l_orderkey", "l_suppkey")
    val ed = orders.join(li, orders("o_orderkey") === li("l_orderkey"))
      .selectExpr("o_custkey AS c", "l_suppkey AS sk").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs: Map[Long, Set[Long]] =
      ed.groupBy(_._1).map { case (c, es) => c -> es.map(_._2).toSet }
    val sdeg: Map[Long, Int] =
      ed.groupBy(_._2).map { case (s, es) => s -> es.length }
    val cs = nbrs.keys.toArray.sorted
    val want = (for {
      i <- cs.indices; j <- (i + 1) until cs.length
      a = cs(i); b = cs(j)
      shared = nbrs(a) intersect nbrs(b)
      if shared.size >= 2
    } yield {
      val cn = shared.size.toLong
      val da = nbrs(a).size.toLong
      val db = nbrs(b).size.toLong
      (a, b) -> ((cn, da, db, cn * 1000000 / (da + db - cn),
        shared.toSeq.map(s => 1000000L / sdeg(s)).sum))
    }).toMap
    val got = q("gr_linkpred").collect().map { r =>
      (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    }.toMap
    assert(got.size == want.size && got == want, s"${got.size} vs ${want.size}")
    assert(got.nonEmpty)
    // RA must actually discriminate: not all pairs share the same score
    assert(got.values.map(_._5).toSet.size > 1)
  }
}
