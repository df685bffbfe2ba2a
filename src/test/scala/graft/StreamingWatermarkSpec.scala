package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Watermark + append-mode semantics over a multi-batch stream (the file
  * sources in the gate queries deliver one batch, so late-data finalization
  * is exercised here with a MemoryStream instead).
  */
class StreamingWatermarkSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  test("append-mode tumbling windows finalize only below the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val agg = mem.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wmk_out").start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    try {
      mem.addData((ts(0), "a"), (ts(1), "a"), (ts(6), "b"))
      q.processAllAvailable()
      // watermark still at 10:06 - 10min < window ends -> nothing final yet
      assert(spark.table("wmk_out").count() == 0)
      mem.addData((ts(30), "c"))
      q.processAllAvailable()
      // watermark 10:20: windows [10:00,10:05) and [10:05,10:10) finalized
      val rows = spark.table("wmk_out")
        .select(col("k"), col("n"), col("window.start").cast("string").as("ws"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows == Set(("a", 2L), ("b", 1L)))
      // a late event behind the watermark is dropped, not re-emitted
      mem.addData((ts(2), "a"), (ts(55), "d"))
      q.processAllAvailable()
      val n2 = spark.table("wmk_out")
        .filter(col("k") === "a").agg(sum("n")).collect()(0).getLong(0)
      assert(n2 == 2L, "late event must not reopen a finalized window")
    } finally q.stop()
  }
}
