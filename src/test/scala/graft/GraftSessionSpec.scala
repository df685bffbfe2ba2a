package graft

import org.scalatest.funsuite.AnyFunSuite

/** The one-call entry point installs every runtime-injectable surface. */
class GraftSessionSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session

  test("install upgrades a live session: functions, strategy, rule") {
    Graft.install(spark)
    // SQL function registered
    val dot = spark.sql(
      "SELECT long_dot(array(1L, 2L, 3L), array(4L, 5L, 6L))")
      .collect()(0).getLong(0)
    assert(dot == 32L)
    // the sketch aggregate is registered too
    val kmin = spark.sql(
      "SELECT kmin_strings(v, 2) FROM VALUES ('c'), ('a'), ('b') AS t(v)")
      .collect()(0).getSeq[String](0)
    assert(kmin == Seq("a", "b"))
    // fusion rule present exactly once even after repeated installs
    Graft.install(spark)
    val exp = org.apache.spark.sql.graft.Bridge.experimental(spark)
    assert(exp.extraOptimizations.count(_ == plans.DotProductFusion) == 1)
    assert(exp.extraStrategies.count(_ == plans.AsOfJoinStrategy) == 1)
  }
}
