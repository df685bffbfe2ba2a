package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** The in-band metrics facility a production pipeline uses to get QA
  * counters FOR FREE with the job: `df.observe(...)` accumulates named
  * aggregates on the rows actually flowing through the plan — no second
  * scan, no separate count job. Pinned here because the dq_* gates are
  * exactly the checks a pipeline would attach this way.
  */
class ObservationSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  test("observe() metrics match the action's own aggregates, one scan") {
    val obs = Observation("gate_metrics")
    val out = spark.read.parquet(s"$sf/events.parquet")
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(expr("CAST(round(value * 1000000) AS BIGINT)")).as("mass"),
        count(when(col("event_type") === "error", 1)).as("errors"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect()
    val m = obs.get
    assert(m("rows_seen") == out.map(_.getAs[Long]("n")).sum,
      "observed row count equals what the aggregate consumed")
    val direct = spark.read.parquet(s"$sf/events.parquet")
      .agg(sum(expr("CAST(round(value * 1000000) AS BIGINT)")),
        count(when(col("event_type") === "error", 1)))
      .collect().head
    assert(m("mass") == direct.getLong(0))
    assert(m("errors") == direct.getLong(1))
  }

  test("observe() sees pre-filter rows while the result sees post-filter") {
    val obs = Observation("filter_metrics")
    val kept = spark.read.parquet(s"$sf/events.parquet")
      .observe(obs, count(lit(1)).as("scanned"))
      .filter(col("event_type") === "purchase")
      .count()
    val total = spark.read.parquet(s"$sf/events.parquet").count()
    assert(obs.get("scanned") == total,
      "metrics attach at their point in the plan, not at the sink")
    assert(kept < total)
  }
}
