package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{call_function, lit, unix_micros}

/** One harness query: a Spark DataFrame implementation plus (when
  * SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB over
  * the same parquet tables (SURVEY.md §7.4).
  *
  * Oracle-parity ground rules (so result hashes match bit-for-bit):
  *  - outputs carry only ints, strings, decimals, or untouched doubles —
  *    never an aggregated raw double (summation order differs per engine);
  *  - ratios use double division of exact ints (IEEE-identical in both);
  *  - every computed column is aliased identically on both sides.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Q {
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Spread a scan-shaped relation across the cluster when its file layout
    * yields far fewer splits than there are cores (optimization guide §2.5
    * "input skew … repartition immediately after the read"): a single-row-
    * group parquet file is unsplittable, so every CPU-heavy derivation
    * downstream of the scan (shingle explode + per-shingle digests, fused
    * minhash/simhash expressions, codec work) otherwise runs at the file's
    * parallelism — 1-2 tasks here — while the rest of the machine idles.
    *
    * Scale-adaptive by construction, not a local[32] constant: the round-
    * robin exchange is added ONLY when the scan's split count is under half
    * of `defaultParallelism`, i.e. exactly when the input is small enough
    * that the exchange is pennies (a production 100 TB corpus arrives in
    * thousands of splits and passes through untouched). Row order changes,
    * which every consumer tolerates (aggregates/joins; the oracle check is
    * order-insensitive). `repartition(n)` with an explicit count is pinned
    * against AQE re-coalescing (REPARTITION_BY_NUM), so the fan-out
    * survives adaptive planning. Callers must hand this a scan/union shape
    * (no exchanges) — `.rdd` on such a plan only lists files, it runs no
    * job.
    */
  def spreadSmallScan(df: DataFrame): DataFrame = {
    if (sys.env.contains("GRAFT_NO_SPREAD")) return df // A/B probe switch
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target) else df
  }

  /** THE timestamp contract, in one place. The harness writes `events.ts`
    * as parquet `timestamp[us]` with no timezone, which Spark reads as
    * TIMESTAMP_NTZ; the DuckDB oracles compute `epoch(ts)` treating the
    * same naive value as UTC. The NTZ-to-LTZ cast below is
    * timezone-dependent, so it reproduces the oracle's epoch ONLY under
    * `spark.sql.session.timeZone=UTC` (pinned in every session builder and
    * asserted by TsContractSpec). Every timestamp-derived column in the
    * query surface goes through these helpers — a future testdata schema or
    * session-zone drift is then a one-line fix, not a 15-gate outage.
    */
  def tsMicros(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Nano-second epoch — parity with DuckDB `epoch_ns` / `* 1e9` oracles. */
  def tsNanos(c: Column): Column = tsMicros(c) * 1000L

  /** Milli-second epoch (integral `div`, as the oracles compute it). */
  def tsMillis(c: Column): Column =
    call_function("div", tsMicros(c), lit(1000L))

  /** Fixed-width epoch bucket of `width` micros (5-min gate buckets etc). */
  def tsBucket(c: Column, widthMicros: Long): Column =
    call_function("div", tsMicros(c), lit(widthMicros))
}
