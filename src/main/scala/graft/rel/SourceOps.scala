package graft.rel

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import Q.tbl

/** Source/sink breadth: the same events relation pushed through ORC, CSV,
  * JSON-lines, and a hive-partitioned parquet layout, then read back and
  * aggregated — each gated by the SAME DuckDB oracle over the ORIGINAL
  * parquet, so a hash match proves the full write -> read -> compute path
  * for every format (layout, type mapping, codec), not just roundtrip
  * self-consistency.
  *
  * Staging stores are per-JVM temp dirs, removed on exit; each invocation
  * stages into a fresh counter-suffixed subdirectory so two concurrent
  * invocations in one JVM can never overwrite (= delete) files under each
  * other's still-active reads. Every store is written executor-side through
  * the DataFrameWriter (distributed, one file per partition — the shape a
  * real export job has).
  */
object SourceOps {

  private lazy val stageRoot = graft.TempDirs.create("graft_src")
  private val invocation = new java.util.concurrent.atomic.AtomicInteger(0)
  private def stage(kind: String): String =
    s"$stageRoot/${kind}_${invocation.incrementAndGet()}"

  /** Events projected to the columns whose text/binary round-trip is
    * format-exact: longs, strings, and the raw double (Java's shortest
    * round-trip rendering re-parses bit-identically).
    */
  private def ev(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "events").select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"))

  /** The shared gate aggregate: per (5-minute bucket, type) counts and an
    * exact decimal sum emitted as double.
    */
  private def gateAgg(df: DataFrame): DataFrame = df
    .withColumn("bucket", expr("ts div 300000000000"))
    .groupBy("bucket", "event_type")
    .agg(count(lit(1)).as("n"),
      sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))

  private val GATE_SQL = """
      SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) AS bucket, event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2"""

  def all: Seq[Q] = Seq(

    // ORC: Spark's second built-in columnar format, with its own codec and
    // type mapping; predicate pushdown and column pruning apply to the
    // read-back scan exactly as for parquet.
    Q("src_orc_roundtrip", (s, d) => {
      val orcDir = stage("orc")
      ev(s, d).write.mode(SaveMode.Overwrite).orc(orcDir)
      gateAgg(s.read.orc(orcDir))
    }, Some(GATE_SQL)),

    // CSV: the text interchange path. Schema is supplied on read (CSV has
    // none); ts survives as the raw nanosecond long, value as the shortest
    // round-trip double rendering.
    Q("src_csv_roundtrip", (s, d) => {
      val csvDir = stage("csv")
      ev(s, d).write.mode(SaveMode.Overwrite)
        .option("header", "true").csv(csvDir)
      gateAgg(s.read.option("header", "true")
        .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, " +
          "event_type STRING, value DOUBLE")
        .csv(csvDir))
    }, Some(GATE_SQL)),

    // JSON lines: the log-interchange path, schema on read.
    Q("src_jsonl_roundtrip", (s, d) => {
      val jsonDir = stage("json")
      ev(s, d).write.mode(SaveMode.Overwrite).json(jsonDir)
      gateAgg(s.read
        .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, " +
          "event_type STRING, value DOUBLE")
        .json(jsonDir))
    }, Some(GATE_SQL)),

    // Hive-partitioned parquet: partitionBy on the filter column, then a
    // filtered read — the filter must become a PartitionFilter (directory
    // pruning, no data read outside the two partitions; plan-guarded in
    // PlanQualitySpec). The 100 TB lever: a partition-pruned scan reads
    // only the slice a query touches.
    Q("src_partitioned_prune", (s, d) => {
      val partDir = stage("part")
      ev(s, d).write.mode(SaveMode.Overwrite)
        .partitionBy("event_type").parquet(partDir)
      gateAgg(s.read.parquet(partDir)
        .filter(col("event_type").isin("click", "purchase")))
    }, Some("""
      SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) AS bucket, event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1, 2""")))
}
