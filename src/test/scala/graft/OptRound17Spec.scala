package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the round-17 optimizations to their pre-optimization semantics.
  *
  * 1. `Q.spreadSmallScan` — the §2.5 input-parallelism spread — must (a)
  *    widen a narrow scan to defaultParallelism, (b) leave an already-wide
  *    relation untouched (same plan object — no exchange added at scale),
  *    and (c) never change the result SET of a consumer.
  *
  * 2. The gr_hits / gr_kcore round-1 strength reductions (skip the
  *    constant-h0 join / the all-endpoints semi-joins) must produce rows
  *    identical to the un-reduced relational form they replaced; the
  *    reference form is kept HERE so drift in the production loop is
  *    caught without a DuckDB round-trip.
  */
class OptRound17Spec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  test("spreadSmallScan widens a narrow scan and preserves the result set") {
    val docs = graft.rel.Q.tbl(spark, sf, "documents")
    val spread = graft.rel.Q.spreadSmallScan(docs)
    assert(spread.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    val a = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val b = spread.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("spreadSmallScan is a no-op on an already-wide relation") {
    val wide = spark.range(0, 10000,
      1, spark.sparkContext.defaultParallelism).toDF("doc_id")
    // same object back: no repartition node was inserted
    assert(graft.rel.Q.spreadSmallScan(wide) eq wide)
  }

  test("gr_hits round-1 reduction matches the explicit h0-join form") {
    import graft.rel.Q.tbl
    val ed = tbl(spark, sf, "orders")
      .join(tbl(spark, sf, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(1000000L)).as("dst"))
      .distinct().cache()
    try {
      // reference: the pre-r17 first half-step, constant h0 joined in
      val h0 = ed.select(col("src").as("node")).distinct()
        .withColumn("h", lit(1000000L))
      val ref = ed.join(h0, col("src") === col("node"))
        .groupBy("dst").agg(sum("h").as("a"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // reduced: what production round 1 now computes
      val red = ed.groupBy("dst").agg((count(lit(1)) * 1000000L).as("a"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(ref == red)
    } finally ed.unpersist(blocking = false)
  }

  test("gr_kcore round-1 reduction matches the explicit semi-join form") {
    import graft.rel.Q.tbl
    val ed = tbl(spark, sf, "orders")
      .join(tbl(spark, sf, "lineitem").filter(col("l_quantity") <= 2),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("a"),
        (col("l_suppkey") + lit(1000000L)).as("b"))
      .distinct()
    val edges = ed.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(ed.select(col("b").as("src"), col("a").as("dst"))).cache()
    try {
      val alive = edges.select(col("src").as("node")).distinct()
      val ref = edges
        .join(alive, col("src") === col("node")).drop("node")
        .join(alive.withColumnRenamed("node", "node2"),
          col("dst") === col("node2"))
        .groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val red = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(ref == red)
    } finally edges.unpersist(blocking = false)
  }
}
