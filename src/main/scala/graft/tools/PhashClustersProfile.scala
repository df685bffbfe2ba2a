package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase breakdown of dd_phash_clusters: pairs materialization vs the
  * component labeling vs the final assembly.
  * Run: sbt "runMain graft.tools.PhashClustersProfile [sfDir]"
  */
object PhashClustersProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000L).selectExpr("sum(id)").collect()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 2).foreach { round =>
      val edges = graft.rel.PipelineOps.phashPairs(spark, d)
        .select(col("id_a"), col("id_b")).persist()
      time(s"r$round pairs materialize") { edges.count() }
      val verts = spark.read.parquet(s"$d/documents.parquet").select("doc_id")
      // replicate the driver path's sub-steps with individual timings
      val sym = time(s"r$round sym mirror+count") {
        val m = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
          .persist()
        println(s"[profile] r$round nSym=" + m.count())
        m
      }
      val collected = time(s"r$round sym collect") {
        import spark.implicits._
        sym.as[(Long, Long)].collect()
      }
      println(s"[profile] r$round edges=${collected.length}")
      val comps = time(s"r$round full connectedComponents") {
        val c = graft.rel.GraphOps.connectedComponents(verts, edges)
        c.count()
        c
      }
      time(s"r$round final collect") { comps.collect().length }
      sym.unpersist()
      edges.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
