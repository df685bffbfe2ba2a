package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tiles.{GridSpec, Tile}

/** Measures the claim behind `st_px_zarr_shard_read`'s standing ~3x gap
  * (COVERAGE round-9 note; VERDICT r8 #2): the ~300-350 ms/trigger
  * micro-batch floor is a FIXED cost, so streaming a store one shard per
  * trigger converges to batch speed as shards grow toward their real
  * (GB-class) size. The gate itself pins shard-granular discovery on
  * 1.1 KB shards, where the floor is everything; this probe holds the
  * store constant (n x n int64 cells) and sweeps the SHARD size, timing
  *
  *   - the batch aggregate on the ROW decode path (the path the streaming
  *     reader uses — so the ratio isolates trigger machinery from decode
  *     cost), and
  *   - the streaming aggregate at `maxChunksPerTrigger=1` (one shard
  *     object per micro-batch, the backfill-throttle shape), plus the
  *     all-in-one-trigger lower bound (the floor paid exactly once).
  *
  * All timings are min-of-2 after a warm pass; run one shard size per JVM
  * (second arg) — within-JVM variance across 2 GB store rewrites is
  * page-cache/GC churn, not signal.
  *
  * Expected: streaming/batch ratio falls monotonically with shard size —
  * the per-trigger tax amortizes over per-trigger bytes — closing the
  * "unreachable at 576-row shards" argument with a measured curve.
  *
  * Run: sbt "runMain graft.tools.StreamAmortizeScale [n]"   (default 16384)
  */
object StreamAmortizeScale {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(16384)
    val chunk = 512
    val g = n / chunk
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val cells = n.toLong * n
    val spec = GridSpec(Array(n.toLong, n.toLong), Array(chunk, chunk))
    def tiles = spark.range(g.toLong * g).map { i =>
      val gy = (i / g).toInt; val gx = (i % g).toInt
      Tile(Array(gy, gx), Array(g, g), Array(chunk, chunk),
        Array.tabulate(chunk * chunk)(j => (i * 31 + j) % 251))
    }

    // warmup: session bring-up + codegen off the clock
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def rm(dir: String): Unit = {
      def go(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(go)); f.delete(); ()
      }
      go(new java.io.File(dir))
    }

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // shard side in CHUNKS: sweep from many-small-shards to one-giant-shard
    val sides = args.drop(1).headOption
      .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(8, 16, 32))
    sides.foreach { s =>
      val shards = (g / s) * (g / s)
      val shardCells = s.toLong * s * chunk * chunk
      val shardMb = shardCells * 8 / 1e6
      // tmpfs: the probe isolates trigger machinery vs per-trigger work;
      // ext4 writeback of the 2 GB store racing the timed reads is noise
      // (observed: identical configs swinging 3-20 s on /tmp)
      val dir = {
        val f = new java.io.File(s"/dev/shm/graft_amortize_s$s")
        rm(f.toString); f.mkdirs(); f.toString
      }
      val (_, wSec) = time {
        graft.sources.Zarr3IO.writeSharded(tiles, spec,
          Array(s * chunk, s * chunk), dir, "int64", gzip = false)
      }

      // batch twin on the ROW decode path — the path the streaming reader
      // uses, so the ratio isolates trigger machinery from decode cost.
      // min-of-2 after a warm pass: the first post-write read absorbs the
      // dirty-page writeback of the store it just wrote.
      def batchOnce(): (Long, Double) = {
        val rd = spark.read.format("zarr").option("vectorized", "false")
        rd.load(dir).agg(sum("value")).collect() // warm (footer cache, JIT)
        time(rd.load(dir).agg(sum("value")).collect()(0).getLong(0))
      }
      val (sumRow, rowA) = batchOnce()
      val (_, rowB) = batchOnce()
      val rowSec = math.min(rowA, rowB)

      // streaming: the gate's shape (one shard object per trigger), then
      // the all-in-one-trigger lower bound (per-trigger floor paid once)
      def stream(perTrigger: Int, tag: String): Double = {
        val qn = s"amortize_s${s}_$tag"
        val rd = spark.readStream.format("zarr")
        val (_, sec) = time {
          val agg = (if (perTrigger > 0)
            rd.option("maxChunksPerTrigger", perTrigger.toString) else rd)
            .load(dir)
            .agg(sum("value").as("s"), count(lit(1)).as("c"))
          val q = graft.streaming.StateSizing.startSized(spark)(
            agg.writeStream.outputMode("complete").format("memory")
              .queryName(qn).start())
          try q.processAllAvailable()
          finally q.stop()
        }
        val r = spark.table(qn).collect()(0)
        assert(r.getLong(0) == sumRow,
          s"stream/batch sum mismatch: ${r.getLong(0)} vs $sumRow")
        assert(r.getLong(1) == cells, s"stream count ${r.getLong(1)} != $cells")
        spark.sql(s"DROP TABLE IF EXISTS $qn")
        sec
      }
      val stSec = math.min(stream(1, "one1"), stream(1, "one2"))
      val stAllSec = math.min(stream(0, "all1"), stream(0, "all2"))

      println(f"[amortize] shard=${s * chunk}x${s * chunk} ($shardMb%7.1f MB raw, " +
        f"$shards%3d objects, ${s * s}%4d inners) write $wSec%6.2f s | " +
        f"batch row $rowSec%5.2f s | " +
        f"stream 1-shard/trigger $stSec%6.2f s (vs-row ${stSec / rowSec}%4.2f) " +
        f"one-trigger $stAllSec%5.2f s (vs-row ${stAllSec / rowSec}%4.2f)")
      rm(dir)
    }
    spark.stop()
  }
}
