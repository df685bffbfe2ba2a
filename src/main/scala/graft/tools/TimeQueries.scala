package graft.tools
import org.apache.spark.sql.SparkSession
/** Ad-hoc per-query wall-time probe: `runMain graft.tools.TimeQueries q1_agg ...` */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"TIME $name%-18s ${(System.nanoTime()-t0)/1e9}%7.2f s  rows=$n")
    }
    val fns = graft.SparkEntry.queries
    for (q <- args) { time(q) { fns(q)(spark, d).count() }; spark.catalog.clearCache() }
    spark.stop()
  }
}
