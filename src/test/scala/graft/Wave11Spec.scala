package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-10 additions: the deterministic epoch reshuffle and the
  * median/MAD outlier screen, checked from first principles (not just
  * against the DuckDB oracle).
  */
class Wave11Spec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  test("ft_epoch_shuffle: reproducible permutation, different per epoch") {
    val rows = SparkEntry.queries("ft_epoch_shuffle")(spark, sf).collect()
    val byEpoch = rows.groupBy(_.getLong(0))
    assert(byEpoch.keySet == Set(0L, 1L))
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .agg(count(lit(1)), sum("doc_id")).collect()(0)
    byEpoch.foreach { case (e, shards) =>
      // every epoch is a PERMUTATION: all docs present exactly once
      assert(shards.map(_.getLong(2)).sum == corpus.getLong(0), s"epoch $e")
      assert(shards.map(_.getLong(3)).sum == corpus.getLong(1), s"epoch $e")
      assert(shards.map(_.getLong(1)).toSet.size == shards.length,
        s"epoch $e shard ids distinct")
    }
    // ...but a DIFFERENT permutation per epoch: the order checksum moves
    val chk0 = byEpoch(0L).map(r => r.getLong(1) -> r.getLong(4)).toMap
    val chk1 = byEpoch(1L).map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(chk0 != chk1, "epoch 0 and 1 must shuffle differently")
    // and reruns agree bit-for-bit (seeded, no RNG state)
    val again = SparkEntry.queries("ft_epoch_shuffle")(spark, sf).collect()
      .map(_.toSeq).toSet
    assert(again == rows.map(_.toSeq).toSet)
  }

  test("aj_nearest matches a brute-force nearest-state scan, tie to prev") {
    val got = SparkEntry.queries("aj_nearest")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), graft.rel.Q.tsNanos(col("ts")).as("t"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val states = ev.filter(_._3 == "purchase")
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    ev.foreach { case (u, t, _) =>
      val expect = states.get(u).filter(_.nonEmpty).map { ss =>
        // min distance, tie broken toward the EARLIER state
        ss.minBy(s => (math.abs(t - s), s))
      }
      assert(got((u, t)) == expect, s"user $u t $t")
    }
  }

  test("sq_hazard: risk sets telescope, hazards bounded, users conserved") {
    val rows = SparkEntry.queries("sq_hazard")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val nUsers = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select("user_id").distinct().count()
    // the risk set at the smallest lifetime is the whole cohort, and it
    // telescopes: n_risk(k) = n_churn(k) + n_risk(next k)
    assert(rows.head._3 == nUsers, "everyone is at risk at the start")
    rows.sliding(2).foreach {
      case Array((_, d0, n0, _), (_, _, n1, _)) =>
        assert(n0 == d0 + n1, "risk set must telescope")
      case _ =>
    }
    assert(rows.last._2 == rows.last._3, "longest survivors all churn there")
    rows.foreach { case (k, d, n, ppm) =>
      assert(k >= 0 && d >= 1 && d <= n, s"k=$k")
      assert(ppm == d * 1000000L / n && ppm <= 1000000L, s"hazard at k=$k")
    }
  }

  test("TopKPairs matches the window formulation on adversarial data") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // heavy ties (values drawn from 10 distinct), many groups, negatives,
    // and enough rows across 16 partitions to force partial-buffer merges
    // and the serialize/deserialize path
    val rows = (0 until 20000).map { i =>
      (rnd.nextInt(20).toLong, (rnd.nextInt(10) - 5).toLong, i.toLong)
    }
    val df = rows.toDF("g", "v", "id").repartition(16)
    val got = df.groupBy("g")
      .agg(graft.functions.TopKPairs(col("v"), col("id"), 5).as("tk"))
      .select(col("g"), posexplode(col("tk")))
      .select(col("g"), col("pos"), col("col.v"), col("col.id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map(t => (t._2, t._3)).sortBy { case (v, i) => (-v, i) }
        .take(5).zipWithIndex
        .map { case ((v, i), pos) => (g, pos, v, i) }
    }.toSet
    assert(got == expected)
  }

  test("TopKPairs: duplicate pairs rank like row_number, not set-deduped") {
    import spark.implicits._
    // the SAME (v, id) pair repeated — row_number gives each duplicate its
    // own rank, so top-3 of {(9,1)x2, (5,2)x3} is (9,1),(9,1),(5,2)
    val df = Seq((0L, 9L, 1L), (0L, 9L, 1L), (0L, 5L, 2L), (0L, 5L, 2L),
      (0L, 5L, 2L), (0L, 1L, 3L)).toDF("g", "v", "id").repartition(4)
    val got = df.groupBy("g")
      .agg(graft.functions.TopKPairs(col("v"), col("id"), 3).as("tk"))
      .selectExpr("inline(tk)").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((9L, 1L), (9L, 1L), (5L, 2L)))
  }

  test("TopKPairs: Long.MinValue ranks worst (no negation overflow)") {
    import spark.implicits._
    // -Long.MinValue == Long.MinValue, so a negating comparator would rank
    // the SMALLEST value best; the compare-based order must rank it last
    val df = Seq((0L, Long.MinValue, 1L), (0L, -3L, 2L), (0L, 7L, 3L),
      (0L, Long.MaxValue, 4L)).toDF("g", "v", "id")
    val got = df.groupBy("g")
      .agg(graft.functions.TopKPairs(col("v"), col("id"), 3).as("tk"))
      .selectExpr("inline(tk)").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((Long.MaxValue, 4L), (7L, 3L), (-3L, 2L)))
  }

  test("topk_pairs is SQL-callable after register") {
    graft.functions.GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT g, tk FROM (
           SELECT id % 3 AS g, topk_pairs(id * 7 % 11, id, 2) AS tk
           FROM range(30) GROUP BY 1)""")
      .selectExpr("g", "inline(tk)").collect()
    assert(rows.length == 6, "3 groups x k=2")
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2) * 7 % 11))
  }

  test("dq_outliers matches a first-principles median/MAD computation") {
    val got = SparkEntry.queries("dq_outliers")(spark, sf).collect()
      .map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val raw = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("vm"))
      .collect().map(r => Option(r.getString(0)) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1))))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else s(n / 2 - 1) + (s(n / 2) - s(n / 2 - 1)) * 0.5
    }
    raw.groupBy(_._1).foreach { case (et, rows) =>
      val vs = rows.flatMap(_._2).map(_.toDouble).toSeq
      val (n, med, mad, nOut) = got(et)
      assert(n == rows.length, s"$et n")
      if (vs.nonEmpty) {
        val m = median(vs)
        val devs = vs.map(v => math.abs(v - m))
        val md = median(devs)
        assert(med == m, s"$et median")
        assert(mad == md, s"$et mad")
        assert(nOut == devs.count(_ > 4.4478 * md), s"$et outlier count")
        assert(nOut < n, s"$et: median/MAD cannot flag a majority")
      }
    }
  }
}
