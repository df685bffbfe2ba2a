package graft

import org.apache.spark.sql.SparkSession

/** THE single code path for everything the benchmark protocol depends on:
  * the session shape, the co-tenant load probe, and the fixed-shape
  * calibration micro-run. [[Bench]] (the per-round artifact) and
  * [[graft.tools.TimeQueries]] (the ad-hoc adjudication probe) both build
  * on this object, so the ruler can never drift between the two paths —
  * before round 14 each tool carried a hand-maintained copy, and the probe
  * path had already drifted once (it never installed [[plans.DotProductFusion]],
  * so its timed plans were not the artifact's plans for the dot-product
  * gates).
  */
object BenchProtocol {

  /** cpus env parsed ONCE, with an `availableProcessors` fallback:
    * `local[*]` is a valid master string but not a number, and a
    * NumberFormatException after a full run would discard the artifact.
    */
  def cpusEnv(): (String, Int) = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").trim
    val n = scala.util.Try(cpus.toInt).toOption
      .getOrElse(Runtime.getRuntime.availableProcessors)
    (cpus, n)
  }

  /** The bench-shaped session: local[cpus], shuffle partitions = cores,
    * AQE on (runtime coalescing + skew-join splitting — the local stand-in
    * for the 1000-executor plan), UTC (the rel/Q timestamp contract is
    * UTC-conditional, so timings exercise the same plans Verify gates),
    * no UI, and the [[plans.DotProductFusion]] rule installed (gates are
    * timed with the plans the artifact measures).
    */
  def session(cpus: String, cpusN: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpusN.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    graft.plans.DotProductFusion.ensureInstalled(spark)
    spark
  }

  /** 1-minute /proc/loadavg, -1 when unreadable. */
  def loadavg(): Double =
    try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).split(" ")(0).toDouble
    catch { case _: Exception => -1.0 }

  /** Host calibration constant: a FIXED CPU+shuffle micro-run (48 M-row
    * arithmetic map, 3 M-group hash aggregate across one exchange, global
    * roll-up). Cross-round comparisons divide per-gate seconds by the two
    * artifacts' calib ratio instead of arguing host speed by hand — the
    * shape must therefore NEVER change across rounds (it is the ruler).
    * On the round-11 reference host class calib_s ≈ low seconds; a 1.3x
    * slower host shows ~1.3x here and ~1.3x on the gate medians.
    */
  def calibOnce(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(48000000L)
      .selectExpr("(id * 2654435761) % 3000000 AS k", "id % 1000003 AS v")
      .groupBy("k").count()
      .selectExpr("sum(count) AS s", "count(*) AS n")
      .collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** The protocol statistic: min-of-3 of [[calibOnce]], run after warmup. */
  def calibMin3(spark: SparkSession): Double =
    (1 to 3).map(_ => calibOnce(spark)).min
}
