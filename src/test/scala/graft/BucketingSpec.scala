package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketing for co-located joins: both fact tables written bucketed by the
  * join key join WITHOUT a shuffle — the plan contains no Exchange. This is
  * the 100 TB co-location strategy (bucket once at ingest, join forever);
  * tested at plan level since that is exactly what holds at any scale.
  */
class BucketingSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  test("bucketed tables sort-merge join with zero exchanges") {
    val sf = "/root/testdata/sf0.001"
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val o = spark.read.parquet(s"$sf/orders.parquet")
      spark.sql(s"CREATE DATABASE IF NOT EXISTS bck LOCATION '${wh.toString}'")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("bck.li_b")
      o.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("bck.o_b")
      val joined = spark.table("bck.li_b")
        .join(spark.table("bck.o_b"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_orderpriority")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scans must be bucketed:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS bck CASCADE")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
