package graft

import java.time.ZoneOffset

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType
import org.scalatest.funsuite.AnyFunSuite

import graft.rel.Q

/** Pins THE timestamp contract every timestamp-derived gate relies on:
  * the harness writes `events.ts` as parquet `timestamp[us]` with no
  * timezone (Spark: TIMESTAMP_NTZ), the DuckDB oracles compute `epoch(ts)`
  * treating the same naive value as UTC, and [[graft.rel.Q.tsMicros]]
  * bridges the two with an NTZ-to-LTZ cast that is instant-exact ONLY
  * under a UTC session zone. If the harness schema or the session zone
  * ever drifts, this one spec fails — instead of 15 downstream gates.
  */
class TsContractSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  test("events.ts is TIMESTAMP_NTZ and the session zone is UTC") {
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    assert(schema("ts").dataType === TimestampNTZType,
      "harness events.ts type drifted — update Q.tsMicros and this spec")
    assert(spark.conf.get("spark.sql.session.timeZone") === "UTC")
  }

  test("Q.tsMicros equals the oracle's epoch: NTZ field read as UTC") {
    // Independent recomputation: collect the raw NTZ values as
    // LocalDateTime and convert driver-side via ZoneOffset.UTC — the
    // exact semantics DuckDB's epoch() applies to a naive timestamp.
    val rows = spark.read.parquet(s"$sf/events.parquet")
      .select(col("ts"), Q.tsMicros(col("ts")).as("us"))
      .limit(500).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ldt = r.getAs[java.time.LocalDateTime](0)
      val expect = ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000L
      assert(r.getLong(1) === expect, s"tsMicros mismatch for $ldt")
    }
  }

  test("derived helpers agree with integral-div oracle arithmetic") {
    val rows = spark.read.parquet(s"$sf/events.parquet")
      .select(Q.tsMicros(col("ts")).as("us"), Q.tsNanos(col("ts")).as("ns"),
        Q.tsMillis(col("ts")).as("ms"),
        Q.tsBucket(col("ts"), 300000000L).as("bucket"))
      .limit(500).collect()
    rows.foreach { r =>
      val us = r.getLong(0)
      assert(r.getLong(1) === us * 1000L)
      assert(r.getLong(2) === us / 1000L)
      assert(r.getLong(3) === us / 300000000L)
    }
  }
}
