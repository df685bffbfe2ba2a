package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DDSketch gate properties: the bin representatives approximate the true
  * quantiles within the gamma bound (4 sub-buckets per octave → worst
  * relative error ~12.5% at the bin edge), and the histogram really is
  * mergeable — splitting the input and adding counts reproduces the
  * whole-input sketch exactly.
  */
class DdSketchSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  test("representatives land within the relative-error envelope") {
    val rows = SparkEntry.queries("sk_ddsketch")(spark, sf).collect()
    val reps = rows.groupBy(_.getString(0)).map { case (et, g) =>
      et -> (g.head.getAs[Long]("q50_rep"), g.head.getAs[Long]("q95_rep"))
    }
    val exact = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("event_type")
      .agg(expr("percentile(CAST(round(value * 1000000) AS BIGINT), 0.5)")
        .as("p50"),
        expr("percentile(CAST(round(value * 1000000) AS BIGINT), 0.95)")
          .as("p95"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for ((et, (r50, r95)) <- reps) {
      val (p50, p95) = exact(et)
      assert(math.abs(r50 - p50) <= 0.14 * p50,
        s"$et q50: rep $r50 vs exact $p50")
      assert(math.abs(r95 - p95) <= 0.14 * p95,
        s"$et q95: rep $r95 vs exact $p95")
    }
  }

  test("histograms merge exactly: split-and-add equals whole-input") {
    def hist(filterExpr: String): Map[(String, Long), Long] =
      spark.read.parquet(s"$sf/events.parquet")
        .filter(filterExpr)
        .select(col("event_type"),
          expr("CAST(round(value * 1000000) AS BIGINT)").as("qv"))
        .selectExpr("event_type",
          "(length(bin(qv)) - 1) * 4 + " +
            "(shiftright(qv, CAST(length(bin(qv)) - 3 AS INT)) & 3) AS bid")
        .groupBy("event_type", "bid").agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = hist("true")
    val even = hist("event_id % 2 = 0")
    val odd = hist("event_id % 2 = 1")
    val merged = (even.keySet ++ odd.keySet).map { k =>
      k -> (even.getOrElse(k, 0L) + odd.getOrElse(k, 0L))
    }.toMap
    assert(merged == whole)
  }
}
