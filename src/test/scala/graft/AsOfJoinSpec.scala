package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.{AsOf, AsOfJoinExec}

class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session

  private def leftDf(rows: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    rows.toDF("k", "t", "tag")
  }
  private def rightDf(rows: Seq[(Long, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("k", "s_t", "v")
  }

  /** Reference semantics via built-ins: argmax over the exploded
    * candidate set (the shape the custom operator avoids at scale).
    */
  private def naive(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) = {
    val cand = l.as("l").join(r.as("r"),
        expr("l.k = r.k AND r.s_t <= l.t"), "left")
      .groupBy(col("l.k").as("k"), col("l.t").as("t"), col("l.tag").as("tag"))
      .agg(max(struct(col("r.s_t"), col("r.v"))).as("m"))
    cand.select(col("k"), col("t"), col("tag"),
      col("m.s_t").as("s_t"), col("m.v").as("v"))
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("matches the exploded-argmax reference on random data") {
    val rnd = new scala.util.Random(7)
    val l = leftDf(Seq.fill(500)((rnd.nextInt(20).toLong,
      rnd.nextInt(1000).toLong, "e" + rnd.nextInt(5))))
    // unique (k, s_t) pairs: as-of is only well-defined with one state per
    // key-instant (the aj_asof query enforces the same with a group-by)
    val r = rightDf(rnd.shuffle(
      (for (k <- 0L until 18L; i <- 0 until 30) yield
        (k, rnd.nextInt(1200).toLong, rnd.nextDouble()))
        .groupBy(p => (p._1, p._2)).map(_._2.head).toSeq))
    val got = AsOf.join(l, r, Seq("k"), "t", "s_t")
    assert(got.columns.toSeq == Seq("k", "t", "tag", "k", "s_t", "v"))
    val gotC = got.toDF("k", "t", "tag", "k2", "s_t", "v").drop("k2")
    assert(canon(gotC) == canon(naive(l, r)))
    assert(got.count() == 500) // exactly one output row per left row
  }

  test("no candidate state -> null right side; equal time matches inclusively") {
    val l = leftDf(Seq((1L, 10L, "early"), (1L, 20L, "attime"), (2L, 99L, "nostate")))
    val r = rightDf(Seq((1L, 15L, 0.5), (1L, 20L, 0.7), (3L, 1L, 0.9)))
    val got = AsOf.join(l, r, Seq("k"), "t", "s_t")
      .toDF("k", "t", "tag", "k2", "s_t", "v")
      .select("tag", "s_t", "v").collect()
      .map(row => (row.getString(0),
        if (row.isNullAt(1)) -1L else row.getLong(1))).toSet
    assert(got == Set(("early", -1L), ("attime", 20L), ("nostate", -1L)))
  }

  private def exchanges(s: String): Int =
    s.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")

  test("plan: AsOfJoin exec over two exchanges, no candidate explosion") {
    val l = leftDf(Seq((1L, 10L, "a"))); val r = rightDf(Seq((1L, 5L, 1.0)))
    val s = AsOf.join(l, r, Seq("k"), "t", "s_t")
      .queryExecution.executedPlan.toString
    assert(s.contains("AsOfJoin"), s)
    assert(!s.contains("BroadcastNestedLoop"), s)
    assert(exchanges(s) == 2, s)
  }

  test("pre-partitioned inputs skip the as-of exchange") {
    val l = leftDf(Seq.tabulate(50)(i => (i.toLong % 5, i.toLong, "x")))
      .repartition(4, col("k"))
    val r = rightDf(Seq.tabulate(50)(i => (i.toLong % 5, i.toLong, 1.0)))
      .repartition(4, col("k"))
    val s = AsOf.join(l, r, Seq("k"), "t", "s_t")
      .queryExecution.executedPlan.toString
    // the only two exchanges are the explicit repartitions; the operator
    // itself adds none (its ClusteredDistribution is already satisfied)
    assert(exchanges(s) == 2, s)
    assert(s.contains("AsOfJoin"), s)
  }

  test("later state with identical key dominates; left duplicates all match") {
    val l = leftDf(Seq((1L, 30L, "d1"), (1L, 30L, "d2")))
    val r = rightDf(Seq((1L, 10L, 0.1), (1L, 20L, 0.2), (1L, 25L, 0.3)))
    val got = AsOf.join(l, r, Seq("k"), "t", "s_t")
      .toDF("k", "t", "tag", "k2", "s_t", "v")
      .select("tag", "s_t").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSet == Set(("d1", 25L), ("d2", 25L)))
    assert(got.length == 2)
  }
}
