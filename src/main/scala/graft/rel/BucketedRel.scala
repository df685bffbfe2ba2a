package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q.tbl

/** The remaining 100 TB plan pattern: a co-located fact-to-fact join over a
  * bucketed warehouse. Both fact tables are written `bucketBy(8, orderkey)`
  * + `sortBy` into a per-JVM external-table directory; reading them back,
  * the join AND the per-orderkey aggregate both consume the scan's
  * HashPartitioning directly — the entire query plans with ZERO Exchange
  * nodes (guarded by `BucketingSpec`). At cluster scale this is the shape
  * that turns a nightly multi-TB join from a full two-sided shuffle into a
  * local merge per bucket.
  *
  * The oracle is bucketing-agnostic (physical layout cannot change results):
  * plain join + group-by in DuckDB over the same parquet inputs.
  */
object BucketedRel {

  private val sinkCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** One warehouse dir per JVM, removed on exit. */
  private lazy val warehouseDir: String = graft.TempDirs.create("graft_bucketed")

  /** Build the bucketed warehouse once per (session, sf dir) — a warehouse
    * is written once and queried many times; re-deriving it on every
    * invocation would bill the one-off layout cost to each query.
    */
  private val built = new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def buildTables(s: SparkSession, d: String): (String, String) =
    built.computeIfAbsent(s.sparkContext.applicationId + "|" + d, { _ =>
      val n = sinkCounter.incrementAndGet()
      val ta = s"graft_bkt_orders_$n"
      val tb = s"graft_bkt_lineitem_$n"
      tbl(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").option("path", s"$warehouseDir/$ta")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ta)
      tbl(s, d, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.mode("overwrite").option("path", s"$warehouseDir/$tb")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(tb)
      (ta, tb)
    })

  /** Pre-build the warehouse (used by Bench's untimed warmup so the timed
    * region measures the co-located join, not the one-off layout write).
    */
  def warm(s: SparkSession, d: String): Unit = { buildTables(s, d); () }

  def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    val (ta, tb) = buildTables(s, d)
    // merge hint pins the sort-merge shape (at harness SF the orders side
    // would broadcast, which demos nothing about co-location)
    s.table(ta).filter(col("o_orderkey") % 50 === 0).hint("merge")
      .join(s.table(tb).filter(col("l_orderkey") % 50 === 0),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_custkey") // bucket-key subset: no re-shuffle
      .agg(count(lit(1)).as("n_items"),
        // exact decimal sums, final cast to double on BOTH engines
        sum(col("l_quantity").cast("decimal(18,6)")).cast("double")
          .as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,6)")).cast("double")
          .as("sum_price"))
  }

  private val SQL = """
    SELECT o_orderkey, o_custkey, count(*) AS n_items,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey % 50 = 0
    GROUP BY o_orderkey, o_custkey"""

  def all: Seq[Q] = Seq(Q("q20_bucketed", bucketedJoin, Some(SQL)))
}
