package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling, demonstrated rather than configured-and-hoped:
  * a join where 90% of the left side shares one key must come out of
  * adaptive execution with the hot partition SPLIT (`skew=true` in the
  * final plan) and still produce exact results. This is the runtime
  * answer to key skew that salting (js_salted) solves statically — both
  * belong in the toolbox at 100 TB.
  */
class AqeSkewSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  test("a 90%-hot key triggers an AQE skew split with exact results") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k =>
      k -> scala.util.Try(conf.get(k)).toOption.filter(_ != null)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      // force a shuffled join — broadcast would dodge the skew entirely
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      val n = 400000L
      val left = spark.range(n)
        .select(when(col("id") % 10 =!= 0, 0L).otherwise(col("id"))
          .as("k"), col("id").as("v"))
      val right = spark.range(2000)
        .select(col("id").as("k"), (col("id") * 3).as("w"))
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("s"))
      val row = joined.collect()(0)

      // exact result: hot key 0 matches right k=0 (w=0); the 10% cold
      // keys k=id (multiples of 10) match right k < 2000
      val hotCount = n - n / 10
      val coldMatches = (0L until 2000L).count(_ % 10 == 0)
      assert(row.getLong(0) == hotCount + coldMatches)

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the hot partition:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }
}
