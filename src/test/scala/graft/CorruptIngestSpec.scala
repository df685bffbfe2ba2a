package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The corrupt-feed census behind src_corrupt_jsonl, and the Spark
  * asymmetry the gate's key filter exists for: PERMISSIVE flags BOTH
  * syntax-corrupt lines and type-corrupt objects in _corrupt_record, but
  * DROPMALFORMED only drops the syntax-corrupt ones — a well-formed JSON
  * object with wrong-typed fields survives as a partial null row. The
  * gate's non-null key filter must remove exactly that residue.
  */
class CorruptIngestSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"
  private val schema = "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, " +
    "event_type STRING, value DOUBLE"

  test("PERMISSIVE census and DROPMALFORMED agree on the garbage lines") {
    val dir = TempDirs.create("graft_corrupt_spec") + "/feed"
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "ts", "user_id", "event_type", "value")
    ev.write.option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .json(dir)
    val garbage = Seq("not json at all", "{\"event_id\": \"noise\"}", "{")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-99999-garbage.json"),
      garbage.mkString("\n").getBytes("UTF-8"))

    val permissive = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .schema(schema + ", _bad STRING")
      .json(dir)
      .cache() // corrupt-column queries require the parsed frame pinned
    try {
      val bad = permissive.filter(col("_bad").isNotNull)
        .select("_bad").collect().map(_.getString(0)).sorted
      assert(bad.toSeq === garbage.sorted, "census must be exactly the splice")
      val clean = permissive.filter(col("_bad").isNull).count()
      assert(clean === ev.count())

      val malformedDropped = spark.read
        .option("mode", "DROPMALFORMED")
        .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .schema(schema).json(dir)
      // the type-corrupt object ({"event_id": "noise"}) survives
      // DROPMALFORMED as a partial null row — syntax-corrupt lines do not
      assert(malformedDropped.count() === clean + 1)
      // …and the gate's key filter removes exactly that residue
      assert(malformedDropped.filter(col("event_id").isNotNull).count()
        === clean)
    } finally permissive.unpersist()
  }
}
