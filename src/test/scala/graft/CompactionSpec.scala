package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The src_compact mechanism: a 64-file fragmented store bin-packs into 2
  * range-partitioned files whose event_id envelopes are disjoint — the
  * property that makes post-compaction scans range-prunable — and the
  * compacted data is row-identical to the fragmented data.
  */
class CompactionSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))

  test("compaction collapses files and yields disjoint range envelopes") {
    val small = TempDirs.create("graft_compact_frag")
    val packed = TempDirs.create("graft_compact_packed")
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "user_id", "event_type", "value")
    ev.repartition(64).write.mode("overwrite").parquet(small)
    assert(parquetFiles(small).length === 64)

    spark.read.parquet(small)
      .repartitionByRange(2, col("event_id"))
      .write.mode("overwrite").parquet(packed)
    val outFiles = parquetFiles(packed)
    assert(outFiles.length === 2)

    // per-file envelopes must not overlap: every row of one file sorts
    // before every row of the other
    val envelopes = outFiles.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("event_id"), max("event_id")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    assert(envelopes(0)._2 < envelopes(1)._1,
      s"overlapping envelopes: ${envelopes.toSeq}")

    // and compaction lost nothing: same multiset of rows
    val a = spark.read.parquet(small).collect().map(_.toSeq).sortBy(_.toString)
    val b = spark.read.parquet(packed).collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq === b.toSeq)
  }
}
