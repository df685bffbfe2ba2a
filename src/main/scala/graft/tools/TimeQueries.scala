package graft.tools
import org.apache.spark.sql.SparkSession
/** Ad-hoc per-query wall-time probe: `runMain graft.tools.TimeQueries q1_agg ...`
  * Session shape matches Bench (UTC, AQE, shuffle=cores) so the timed plans
  * are the ones the artifact measures; repeat a name for min-of-N. Prints
  * the same fixed-shape `calib` micro-run Bench records, so probe numbers
  * can be calib-normalized against any round's artifact.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$d/lineitem.parquet").limit(1).collect()
    def loadavg(): String =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ")(0)
      catch { case _: Exception => "-1" }
    def calibOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(48000000L)
        .selectExpr("(id * 2654435761) % 3000000 AS k", "id % 1000003 AS v")
        .groupBy("k").count()
        .selectExpr("sum(count) AS s", "count(*) AS n").collect()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"CALIB ${(1 to 3).map(_ => calibOnce()).min}%.3f s (min-of-3)")
    def time(name: String)(f: => Long): Unit = {
      val load = loadavg()
      val t0 = System.nanoTime(); val n = f
      println(f"TIME $name%-18s ${(System.nanoTime()-t0)/1e9}%7.2f s  rows=$n  load=$load")
    }
    val fns = graft.SparkEntry.queries
    for (q <- args) { time(q) { fns(q)(spark, d).count() }; spark.catalog.clearCache() }
    spark.stop()
  }
}
