package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.rel.{Q, SourceOps}

/** Micro-precision text interchange, pinned harder than the 5-minute-bucket
  * gates can: the re-read `ts` must equal the source at MICROsecond
  * resolution for both CSV and JSON-lines — the default
  * `timestampNTZFormat` (`yyyy-MM-dd'T'HH:mm:ss[.SSS]`) would parse fine
  * yet silently truncate micros to millis, which a coarse bucket aggregate
  * never notices. The last test injects exactly that misconfiguration and
  * asserts this spec's check catches it.
  */
class TextTsRoundtripSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def src() = spark.read.parquet(s"$sf/events.parquet")
    .select(col("event_id"), col("ts"))

  /** (event_id -> epoch micros) for an events-shaped frame. */
  private def micros(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select(col("event_id"), Q.tsMicros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def roundtrip(fmt: String, ntzFormat: String): Map[Long, Long] = {
    val dir = TempDirs.create(s"graft_tsrt_$fmt") + "/stage"
    val w = src().write.mode("overwrite")
      .option("header", "true").option("rowTag", "event")
      .option("timestampNTZFormat", ntzFormat)
    fmt match {
      case "csv" => w.csv(dir); case "json" => w.json(dir)
      case "xml" => w.xml(dir)
    }
    val r = spark.read
      .option("header", "true").option("rowTag", "event")
      .option("timestampNTZFormat", ntzFormat)
      .schema("event_id BIGINT, ts TIMESTAMP_NTZ")
    micros(fmt match {
      case "csv" => r.csv(dir); case "json" => r.json(dir)
      case "xml" => r.xml(dir)
    })
  }

  test("CSV, JSONL and XML round-trip ts micro-exactly under TS_FMT") {
    val expect = micros(src())
    // the fixture must actually exercise sub-milli precision
    assert(expect.values.count(_ % 1000L != 0L) > 100)
    assert(roundtrip("csv", SourceOps.TS_FMT) === expect)
    assert(roundtrip("json", SourceOps.TS_FMT) === expect)
    assert(roundtrip("xml", SourceOps.TS_FMT) === expect)
  }

  test("a millis-only NTZ format would be caught, not silently pass") {
    val expect = micros(src())
    val truncated = roundtrip("csv", "yyyy-MM-dd HH:mm:ss.SSS")
    // every value still parses (no NULLs) …
    assert(truncated.size === expect.size)
    // … but micros are gone — the failure mode this spec exists to catch
    assert(truncated !== expect)
    assert(truncated.forall { case (_, us) => us % 1000L == 0L })
  }
}
