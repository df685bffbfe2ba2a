package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spatial-join guarantees: the grid-binned candidate join finds EXACTLY
  * the pairs a brute-force all-pairs scan finds (binning is a pure
  * optimization), the exact test agrees with an independent geometric
  * containment check, and the plan is an equi-join — never a cartesian.
  */
class SpatialOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def run() = SparkEntry.queries("geo_pip_join")(spark, sf)

  test("binned join equals brute-force all-pairs containment") {
    val got = run().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: cross join every point with every polygon, same exact
    // integer test, no binning
    spark.read.parquet(s"$sf/part.parquet").createOrReplaceTempView("part")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .createOrReplaceTempView("lineitem")
    val brute = spark.sql(s"""
      WITH polys AS (
        SELECT p_partkey AS poly_id,
               64 + (p_partkey * 37) % 1024 AS cx,
               64 + (p_partkey * 91) % 1024 AS cy,
               1 + (p_partkey * 13) % 50 AS r1,
               1 + (p_partkey * 29) % 50 AS r2,
               1 + (p_partkey * 53) % 50 AS r3,
               1 + (p_partkey * 71) % 50 AS r4
        FROM part WHERE p_partkey % 3 = 0),
      pts AS (
        SELECT l_orderkey * 10 + l_linenumber AS pt_id,
               64 + (l_orderkey * 7 + l_linenumber * 131) % 1024 AS px,
               64 + (l_partkey * 11 + l_suppkey * 17) % 1024 AS py
        FROM lineitem WHERE l_orderkey % 13 = 0)
      SELECT poly_id, pt_id FROM pts CROSS JOIN polys
      WHERE ${graft.rel.SpatialOps.INSIDE}""").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty, "degenerate fixture: no contained points")
    assert(got === brute,
      s"binning changed the result: only-binned=${(got -- brute).take(5)} " +
        s"only-brute=${(brute -- got).take(5)}")
  }

  test("exact test agrees with independent half-plane containment") {
    // the diamond (cx+-r, cy+-r) is an intersection of 4 half-planes; for
    // STRICTLY interior / exterior points both predicates must agree (the
    // crossing rule and the half-plane rule may differ only ON the
    // boundary, where either classification is acceptable as long as both
    // engines share it — which the hash gate already proves)
    val rows = run().collect()
    for (r <- rows) {
      val (polyId, px, py) = (r.getLong(0), r.getLong(2), r.getLong(3))
      val k = polyId
      val (cx, cy) = (64 + (k * 37) % 1024, 64 + (k * 91) % 1024)
      val (r1, r2, r3, r4) = (1 + (k * 13) % 50, 1 + (k * 29) % 50,
        1 + (k * 53) % 50, 1 + (k * 71) % 50)
      // half-plane form: x-excess over each diagonal edge, scaled exact
      val e1 = (px - cx) * r2 + (py - cy) * r1 - r1 * r2 // edge V1-V2
      val e2 = -(px - cx) * r2 + (py - cy) * r3 - r2 * r3 // V2-V3
      val e3 = -(px - cx) * r4 - (py - cy) * r3 - r3 * r4 // V3-V4
      val e4 = (px - cx) * r4 - (py - cy) * r1 - r4 * r1 // V4-V1
      assert(e1 <= 0 && e2 <= 0 && e3 <= 0 && e4 <= 0,
        s"reported-inside point ($px,$py) outside diamond $polyId")
    }
  }

  test("radius join equals brute-force all-pairs distance scan") {
    val got = SparkEntry.queries("geo_radius_join")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    spark.read.parquet(s"$sf/lineitem.parquet")
      .createOrReplaceTempView("lineitem")
    spark.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("orders")
    val brute = spark.sql("""
      WITH pts AS (
        SELECT l_orderkey * 10 + l_linenumber AS pt_id,
               64 + (l_orderkey * 7 + l_linenumber * 131) % 1024 AS px,
               64 + (l_partkey * 11 + l_suppkey * 17) % 1024 AS py
        FROM lineitem WHERE l_orderkey % 13 = 0),
      sites AS (
        SELECT o_orderkey AS site_id,
               64 + (o_orderkey * 19) % 1024 AS sx,
               64 + (o_orderkey * 43) % 1024 AS sy
        FROM orders WHERE o_orderkey % 11 = 0)
      SELECT pt_id, site_id,
             (px - sx) * (px - sx) + (py - sy) * (py - sy) AS dist2
      FROM pts CROSS JOIN sites
      WHERE (px - sx) * (px - sx) + (py - sy) * (py - sy) <= 256""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty && got === brute,
      s"stencil join diverges from brute force: ${got.size} vs ${brute.size}")
  }

  test("plan: candidates via equi-join on cell, no cartesian") {
    val p = run().queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"spatial join degenerated to all-pairs:\n$p")
  }
}
