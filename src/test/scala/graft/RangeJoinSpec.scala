package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

class RangeJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("matches the naive inequality join across bin widths, negatives included") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val pts = Seq.fill(400)((rnd.nextInt(5).toLong,
      (rnd.nextInt(2000) - 1000).toLong, rnd.nextInt(100)))
      .toDF("k", "p", "payload")
    val ivs = Seq.fill(60) {
      val lo = (rnd.nextInt(2000) - 1000).toLong
      (rnd.nextInt(5).toLong, lo, lo + rnd.nextInt(300).toLong)
    }.toDF("k", "lo", "hi").distinct()
    val naive = canon(pts.join(ivs, Seq("k"))
      .filter(col("p") >= col("lo") && col("p") <= col("hi")))
    for (bw <- Seq(1L, 7L, 128L, 100000L)) {
      val got = canon(RangeJoin.pointInInterval(
        pts, ivs, Seq("k"), "p", "lo", "hi", bw)
        .select(pts.columns.map(col) ++ Seq(col("lo"), col("hi")): _*))
      assert(got == naive, s"binWidth=$bw")
    }
  }

  test("plan is an equi-join, not a broadcast nested loop") {
    import spark.implicits._
    val pts = Seq((1L, 5L)).toDF("k", "p")
    val ivs = Seq((1L, 0L, 9L)).toDF("k", "lo", "hi")
    val s = RangeJoin.pointInInterval(pts, ivs, Seq("k"), "p", "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!s.contains("BroadcastNestedLoop"), s)
  }
}
