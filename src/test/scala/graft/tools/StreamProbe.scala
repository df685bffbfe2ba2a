package graft.tools
import org.apache.spark.sql.SparkSession

/** Print per-micro-batch progress JSON for the stream-stream join, to
  * attribute its wall time (triggers vs state commits vs scan). Usage:
  *   Test/runMain graft.tools.StreamProbe <sfDir> [shufflePartitions]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        if (args.length > 1) args(1) else "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000L).selectExpr("md5(CAST(id AS STRING))").count()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
          println("[progress] " + e.progress.json)
        def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries("st_stream_join")(spark, args(0))
    val n = df.count()
    println(f"[probe] total ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    for (q <- spark.streams.active) q.stop()
    spark.stop()
  }
}
