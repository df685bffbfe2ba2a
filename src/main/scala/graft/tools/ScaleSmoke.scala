package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.{CCLSegmentation, Relabel}
import graft.tiles.{GridSpec, Tile}

/** Throughput smoke for the tile engine at a scale the golden fixtures
  * don't reach: an NxN grid of 128x128 tiles with a dense synthetic blob
  * pattern, through the full image2labels pipeline (two shuffles) on
  * local[32].
  *
  * `sbt "runMain graft.tools.ScaleSmoke 32"` -> 32x32 grid = 16.8M pixels.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 32
    val cs = 128
    val ov = 16
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // deterministic blob field: ~1 object per 24x24 cell, radius <= 6 << ov
    val tiles = spark.range(n.toLong * n).map { lin =>
      val (gy, gx) = ((lin / n).toInt, (lin % n).toInt)
      val data = new Array[Long](cs * cs)
      var y = 0
      while (y < cs) {
        val iy = gy * cs + y
        var x = 0
        while (x < cs) {
          val ix = gx * cs + x
          // blob centers on a 24-pixel lattice, jittered by a hash
          val cy = (iy / 24) * 24 + 12 + ((iy / 24 * 31 + ix / 24 * 17) % 7 - 3)
          val cx = (ix / 24) * 24 + 12 + ((iy / 24 * 13 + ix / 24 * 29) % 7 - 3)
          val dy = iy - cy; val dx = ix - cx
          if (dy * dy + dx * dx <= 25) data(y * cs + x) = 1L
          x += 1
        }
        y += 1
      }
      Tile(Array(gy, gx), Array(n, n), Array(cs, cs), data)
    }

    val spec = GridSpec(Array(n.toLong * cs, n.toLong * cs), Array(cs, cs))
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val totalPx = n.toLong * n * cs * cs
    println(s"grid ${n}x$n of ${cs}x$cs tiles = $totalPx pixels, overlap $ov")
    val t0 = System.nanoTime()
    val out = Relabel.image2labels(tiles, spec, CCLSegmentation(),
      Array(ov, ov), threshold = 0.05)
    val nLabels = timed("image2labels+distinct") {
      out.flatMap(_.data.distinct.iterator).distinct().count()
    }
    val wall = (System.nanoTime() - t0) / 1e9
    val expected = (n.toLong * cs / 24) * (n.toLong * cs / 24)
    println(f"objects: ${nLabels - 1} (lattice upper bound ~$expected)")
    println(f"wall ${wall}%.2f s  |  ${totalPx / wall / 1e6}%.1f Mpx/s")
    spark.stop()
  }
}
