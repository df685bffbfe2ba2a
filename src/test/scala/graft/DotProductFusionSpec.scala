package graft

import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rule must substitute the native fused dot product for the
  * declarative aggregate(zip_with(...)) idiom — same results, different
  * plan — and must NOT fire on folds that are not dot products. Inputs
  * derive from spark.range so the plan cannot constant-fold away.
  */
class DotProductFusionSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session

  // a = [2id+j], b = [id+3j], j = 0..3:
  // dot(id) = sum_j (2id+j)(id+3j) = 8 id^2 + 42 id + 42
  private def vecs = spark.range(2).selectExpr(
    "id",
    "transform(sequence(0, 3), j -> id * 2 + j) AS a",
    "transform(sequence(0, 3), j -> id + 3 * j) AS b")

  private def run(body: String): (String, Seq[Long]) = {
    graft.plans.DotProductFusion.ensureInstalled(spark)
    val df = vecs.selectExpr(s"$body AS r").orderBy("r")
    (df.queryExecution.optimizedPlan.toString,
      df.collect().map(_.getLong(0)).toSeq)
  }

  test("rule rewrites the idiom to LongDotProduct with identical results") {
    val (opt, rows) = run(
      "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), " +
        "(acc, v) -> acc + v)")
    assert(opt.toLowerCase.contains("longdotproduct"),
      s"fusion did not fire:\n$opt")
    assert(rows == Seq(42L, 92L))
  }

  test("rule ignores folds that are not a plain product-sum") {
    val (optAbs, rowsAbs) = run(
      "aggregate(zip_with(a, b, (x, y) -> abs(x * y)), CAST(0 AS BIGINT), " +
        "(acc, v) -> acc + v)")
    assert(!optAbs.toLowerCase.contains("longdotproduct"),
      s"fusion fired on a non-dot fold:\n$optAbs")
    assert(rowsAbs == Seq(42L, 92L))
    // seed != 0 must not fuse (it changes the result)
    val (optSeed, rowsSeed) = run(
      "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(5 AS BIGINT), " +
        "(acc, v) -> acc + v)")
    assert(!optSeed.toLowerCase.contains("longdotproduct"))
    assert(rowsSeed == Seq(47L, 97L))
  }

  test("operand order in the multiply is commutatively matched") {
    val (opt, rows) = run(
      "aggregate(zip_with(a, b, (x, y) -> y * x), CAST(0 AS BIGINT), " +
        "(acc, v) -> acc + v)")
    assert(opt.toLowerCase.contains("longdotproduct"),
      s"fusion did not fire on swapped operands:\n$opt")
    assert(rows == Seq(42L, 92L))
  }
}
