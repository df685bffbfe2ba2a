package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.scalatest.funsuite.AnyFunSuite

/** Concurrent invocations of the staged source round-trips must not clobber
  * each other: each invocation stages into its own counter-suffixed
  * directory, so one run's overwrite can never delete files under another
  * run's still-active read.
  */
class SourceStagingSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  test("two concurrent staged round-trips produce identical results") {
    val sf = "/root/testdata/sf0.001"
    val fn = SparkEntry.queries("src_csv_roundtrip")
    def run(): Map[(Long, String), (Long, Double)] =
      fn(spark, sf).collect()
        .map(r => (r.getLong(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
    val (a, b) = (Future(run()), Future(run()))
    val (ra, rb) = (Await.result(a, 120.seconds), Await.result(b, 120.seconds))
    assert(ra.nonEmpty && ra == rb)
    assert(ra == run()) // and a sequential run agrees
  }

  test("fixed-width zero-padded slots round-trip negatives sign-aware") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vals: Seq[java.lang.Long] =
      Seq(0L, 5L, -5L, 123456L, -123456L, 9999999999999L, -999999999999L)
        .map(java.lang.Long.valueOf) :+ null
    val df = vals.toDF("v")
    val enc = df.select(col("v"),
      graft.rel.SourceOps.fwField(col("v"), 14, "0", left = true).as("slot"))
    val rows = enc.collect()
    rows.foreach { r =>
      assert(r.getString(1).length == 14, "slot width is exact")
      if (!r.isNullAt(0) && r.getLong(0) < 0)
        assert(r.getString(1).startsWith("-0") ||
          r.getString(1).startsWith("-9"), s"sign leads the slot: ${r.getString(1)}")
    }
    val back = enc
      .select(col("v"), expr("CAST(nullif(trim(slot), '') AS BIGINT)").as("rt"))
      .collect()
    back.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1), "NULL rides as all-spaces")
      else assert(r.getLong(0) == r.getLong(1), s"round-trip: ${r.getLong(0)}")
    }
    // over-width still fails loudly, sign included (15 chars > 14 slot)
    val ex = intercept[Exception] {
      Seq(java.lang.Long.valueOf(-99999999999999L)).toDF("v")
        .select(graft.rel.SourceOps.fwField(col("v"), 14, "0", left = true))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("fixed-width field overflow")))
  }
}
