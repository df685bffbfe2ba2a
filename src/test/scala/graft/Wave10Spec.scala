package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-10 invariants beyond the hash gates: the CDC closure property
  * replayed in-engine, modularity accounting identities, bounded-state
  * dedup exactness under full-feed redelivery, outer-join null discipline,
  * and streaming-vs-batch sketch parity.
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

  test("st_sk_hll: streaming register table equals the batch sketch") {
    val stream = run("st_sk_hll")
    val batch = run("sk_hll_users")
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty,
      "4-batch arbitrary-order merge == single-pass batch sketch")
  }
}
