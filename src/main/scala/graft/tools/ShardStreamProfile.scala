package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Profiles `st_px_zarr_shard_read`'s streaming half (VERDICT r7 #7 / r8 #2:
  * the gate ran ~3-4x its batch twin). Phases timed separately: the sharded
  * store WRITE (shared with the batch twin), then the streaming read with a
  * per-micro-batch `durationMs` dump from the progress listener — which
  * attributes the gap between triggered-batch machinery (offset WAL, state
  * commit, planning) and actual source work (listing + shard reads).
  *
  * Run: sbt "runMain graft.tools.ShardStreamProfile [sfDir]"
  */
object ShardStreamProfile {
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

    val progress = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        progress.add(s"batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs}")
      }
    })

    // warmup: a tiny batch query so JIT/codegen/session bring-up is not
    // billed to the phases below
    spark.range(100000L).selectExpr("sum(id)").collect()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // phase 1: the batch twin, for the honest denominator
    time("batch twin px_zarr3_sharded (write+read+pipeline)") {
      graft.rel.PipelineOps.zarr3Sharded(spark, d).count()
    }
    spark.catalog.clearCache()

    // phase 2: the streaming gate, whole
    time("st_px_zarr_shard_read whole") {
      graft.streaming.StreamingOps.zarrShardStreamRead(spark, d).count()
    }
    progress.forEach(p => println(s"[profile] $p"))
    progress.clear()

    // phase 3: same gate, state partitions 1 (24 result groups need one)
    spark.conf.set(graft.streaming.StateSizing.ConfKey, "1")
    time("st_px_zarr_shard_read statePartitions=1") {
      graft.streaming.StreamingOps.zarrShardStreamRead(spark, d).count()
    }
    spark.conf.unset(graft.streaming.StateSizing.ConfKey)
    progress.forEach(p => println(s"[profile] $p"))
    progress.clear()

    // phase 3b: same gate, checkpoint WAL + state store on tmpfs — does
    // the ext4 fsync cost of offset/commit logs and state deltas set the
    // per-trigger floor, or is it scheduling?
    {
      val shm = new java.io.File("/dev/shm/graft_ckpt_probe")
      shm.mkdirs()
      spark.conf.set("spark.sql.streaming.checkpointLocation", shm.toString)
      time("st_px_zarr_shard_read ckpt on tmpfs") {
        graft.streaming.StreamingOps.zarrShardStreamRead(spark, d).count()
      }
      spark.conf.unset("spark.sql.streaming.checkpointLocation")
      progress.forEach(p => println(s"[profile] $p"))
      progress.clear()
    }

    // phase 4: same store, ALL shards in one trigger — isolates the
    // per-micro-batch machinery tax from the per-byte source work (a real
    // 100 TB shard is GBs, so one trigger per shard amortizes the same
    // fixed cost over ~10^6x the data)
    {
      import org.apache.spark.sql.functions._
      import graft.rel.RelabelRel
      val storeDir = graft.TempDirs.create("graft_profile_shsrc")
      val gyL = RelabelRel.GY.toLong * RelabelRel.L
      val gxL = RelabelRel.GX.toLong * RelabelRel.L
      RelabelRel.pixelsRaw(spark, d)
        .selectExpr("gy AS g0", "gx AS g1", "py AS p0", "px AS p1",
          "label AS value")
        .write.format("zarr")
        .option("shape", s"$gyL,$gxL")
        .option("chunks", s"${RelabelRel.L},${RelabelRel.L}")
        .option("shards", s"${2 * RelabelRel.L},${2 * RelabelRel.L}")
        .option("dtype", "uint16").option("compressor", "gzip")
        .option("zarrFormat", "3")
        .mode("overwrite").save(storeDir)
      time("stream read, all shards in ONE trigger") {
        val agg = spark.readStream.format("zarr").load(storeDir)
          .filter(col("value") =!= 0)
          .groupBy(col("g0").as("gy"), col("g1").as("gx"))
          .agg(count(lit(1)).as("n_px"), sum("value").as("sum_label"))
        val q = graft.streaming.StateSizing.startSized(spark)(
          agg.writeStream.outputMode("complete").format("memory")
            .queryName("profile_one_trigger").start())
        try q.processAllAvailable()
        finally q.stop()
        spark.table("profile_one_trigger").count()
      }
      progress.forEach(p => println(s"[profile] $p"))
    }

    spark.stop()
  }
}
