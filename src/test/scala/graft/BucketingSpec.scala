package graft

import org.scalatest.funsuite.AnyFunSuite

/** The co-located warehouse property is asserted, not hoped for: with both
  * fact tables bucketed by the join key, the join AND the bucket-key
  * aggregate must consume the scans' hash partitioning directly — a plan
  * with ANY Exchange means the warehouse layout bought nothing.
  */
class BucketingSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  test("q20_bucketed: join + aggregate plan has zero exchanges") {
    val p = SparkEntry.queries("q20_bucketed")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"expected the pinned merge join:\n$p")
    assert(!p.contains("Exchange"),
      s"bucketed co-location failed — plan shuffles:\n$p")
    assert(p.contains("Bucketed: true"),
      s"scan did not use the bucketed layout:\n$p")
  }
}
