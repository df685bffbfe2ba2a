package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning (InjectRuntimeFilter): a selective
  * dimension predicate must materialize as a bloom filter applied to the
  * FACT side before its shuffle — the row-level runtime filter that cuts
  * shuffle volume when static partition pruning can't apply. Asserted on
  * the optimized plan, with results cross-checked against the unfiltered
  * join.
  */
class RuntimeFilterSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  test("selective dim filter injects a bloom filter on the fact side") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k =>
      k -> scala.util.Try(conf.get(k)).toOption.filter(_ != null)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold", "0")
      // broadcast would bypass the shuffle the filter exists to shrink
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val fact = spark.range(500000)
        .select(col("id").as("k"), (col("id") % 1000).as("v"))
      val dim = spark.range(100000)
        .select(col("id").as("k"), (col("id") % 97).as("g"))
        .filter(col("g") === 3) // selective: ~1% of dim keys survive
      val joined = fact.join(dim, "k").agg(count(lit(1)).as("n"),
        sum("v").as("s"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") ||
        plan.contains("BloomFilterMightContain") ||
        plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")

      // exactness: same aggregate without the runtime filter machinery
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val expect = fact.join(dim, "k").agg(count(lit(1)), sum("v")).collect()(0)
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      val got = joined.collect()(0)
      assert(got.getLong(0) == expect.getLong(0) &&
        got.getLong(1) == expect.getLong(1))
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }
}
