package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.ZarrIO
import graft.sources.zarr.ZarrTableProvider
import graft.tiles.{GridSpec, Tile}

/** The vectorized (ColumnarBatch) zarr read path: plan shape, agreement
  * with the row-at-a-time reader, pruning interplay, and the >4096-cell
  * multi-batch case.
  */
class ZarrVectorizedSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  // 3x2 grid of 70x70 chunks over a 200x130 image: one full chunk holds
  // 4900 cells > the 4096 batch size, so every full chunk spans 2 batches;
  // ragged edges exercise the clipped-tile stride math
  private lazy val dir: String = {
    import spark.implicits._
    val d = TempDirs.create("graft_vec_spec")
    val spec = GridSpec(Array(200L, 130L), Array(70, 70))
    val tiles = for (gy <- 0 until 3; gx <- 0 until 2) yield {
      val h = math.min(70, 200 - gy * 70); val w = math.min(70, 130 - gx * 70)
      Tile(Array(gy, gx), Array(3, 2), Array(h, w),
        Array.tabulate(h * w) { i =>
          val y = gy * 70 + i / w; val x = gx * 70 + i % w
          y.toLong * 1009 + x + 1
        })
    }
    ZarrIO.write(spark.createDataset(tiles), spec, d, "<i8", "zlib")
    d
  }

  test("columnar scan is planned by default; vectorized=false opts out") {
    val vec = spark.read.format("zarr").load(dir)
    assert(vec.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      vec.queryExecution.executedPlan.toString)
    val row = spark.read.format("zarr").option("vectorized", "false").load(dir)
    assert(!row.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      row.queryExecution.executedPlan.toString)
  }

  test("vectorized rows agree with the row reader across batch boundaries") {
    def all(vectorized: Boolean) =
      spark.read.format("zarr").option("vectorized", vectorized.toString)
        .load(dir)
        .selectExpr("g0 * 70 + p0 AS y", "g1 * 70 + p1 AS x", "value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val vec = all(vectorized = true)
    assert(vec.size == 200 * 130)
    assert(vec == all(vectorized = false))
    // spot-check the value formula at a ragged-edge cell
    assert(vec.contains((199L, 129L, 199L * 1009 + 129 + 1)))
  }

  test("aggregates over the columnar scan match closed form") {
    val df = spark.read.format("zarr").load(dir)
    val Array(s, n) = df.agg(sum("value"), count(lit(1))).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    // sum over y<200, x<130 of y*1009 + x + 1
    val expect = (0L until 200L).map(_ * 1009 * 130).sum +
      (0L until 130L).map(_ + 1).sum * 200
    assert(n == 200 * 130 && s == expect)
  }

  test("column pruning still skips payload I/O on the columnar path") {
    ZarrTableProvider.payloadReads.set(0)
    val coords = spark.read.format("zarr").load(dir).select("g0", "p0")
    assert(coords.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(coords.count() == 200 * 130)
    assert(ZarrTableProvider.payloadReads.get() == 0,
      "coordinate-only columnar scan opened chunk files")
    val full = spark.read.format("zarr").load(dir).agg(sum("value"))
    full.collect()
    assert(ZarrTableProvider.payloadReads.get() == 6)
  }

  test("chunk pruning composes with the columnar reader") {
    val df = spark.read.format("zarr").load(dir)
      .filter(col("g0") === 2 && col("g1") === 1)
    assert(df.rdd.getNumPartitions == 1)
    // chunk (2,1) is the doubly-ragged corner: 60x60
    assert(df.count() == 60 * 60)
    assert(df.agg(min("p0"), max("p0"), min("p1"), max("p1"))
      .collect()(0).toSeq == Seq(0L, 59L, 0L, 59L))
  }
}
