package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.ZarrIO
import graft.sources.zarr.ZarrTableProvider
import graft.tiles.{GridSpec, Tile}

/** Complete aggregate pushdown on the zarr DSv2 source: count/min/max over
  * coordinates answered from the chunk listing alone — no payload I/O, no
  * per-cell row stream, one metadata task.
  */
class ZarrAggPushdownSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  // 4x3 grid of 7x7 chunks over a 26x19 image (ragged edges), with chunk
  // (3, 2) ABSENT (all-fill chunks are not materialized) — aggregates must
  // reflect the listing, not the nominal grid
  private lazy val dir: String = {
    import spark.implicits._
    val d = TempDirs.create("graft_aggpush")
    val spec = GridSpec(Array(26L, 19L), Array(7, 7))
    val tiles = for {
      gy <- 0 until 4; gx <- 0 until 3
      if !(gy == 3 && gx == 2)
    } yield {
      val h = math.min(7, 26 - gy * 7); val w = math.min(7, 19 - gx * 7)
      Tile(Array(gy, gx), Array(4, 3), Array(h, w),
        Array.tabulate(h * w)(i => (i % 5).toLong + 1))
    }
    ZarrIO.write(spark.createDataset(tiles), spec, d, "<i8", "zlib")
    d
  }

  private def zarr = spark.read.format("zarr").load(dir)

  test("count(*) is a one-partition metadata scan with zero payload I/O") {
    ZarrTableProvider.payloadReads.set(0)
    val df = zarr.agg(count(lit(1)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ZarrAggScan"), s"aggregate not pushed:\n$plan")
    // full chunks: 7x7; edge rows/cols clipped; chunk (3,2) missing
    val cells = (for {
      gy <- 0 until 4; gx <- 0 until 3
      if !(gy == 3 && gx == 2)
    } yield math.min(7, 26 - gy * 7).toLong * math.min(7, 19 - gx * 7)).sum
    assert(df.collect()(0).getLong(0) == cells)
    assert(df.rdd.getNumPartitions == 1)
    assert(ZarrTableProvider.payloadReads.get() == 0,
      "pushed count opened chunk files")
  }

  test("count/min/max over coordinates push together; pruning applies") {
    ZarrTableProvider.payloadReads.set(0)
    val df = zarr.filter(col("g0") >= 1 && col("g0") <= 2)
      .agg(count(lit(1)).as("n"), min("g0").as("mng"), max("g0").as("mxg"),
        min("p1").as("mnp"), max("p1").as("mxp"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ZarrAggScan"), s"aggregate not pushed:\n$plan")
    val r = df.collect()(0)
    // rows 1..2: all chunks full-height 7; widths 7,7,5 per row
    assert(r.getLong(0) == 2L * 7 * (7 + 7 + 5))
    assert(r.getLong(1) == 1L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 0L && r.getLong(4) == 6L)
    assert(ZarrTableProvider.payloadReads.get() == 0)
  }

  test("min/max over value refuses pushdown and still answers correctly") {
    val df = zarr.agg(max("value"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ZarrAggScan"), s"value agg wrongly pushed:\n$plan")
    assert(df.collect()(0).getLong(0) == 5L)
  }

  test("an emptied chunk box yields count 0 and null extrema") {
    val df = zarr.filter(col("g0") === 9)
      .agg(count(lit(1)), min("g1"), max("p0"))
    val r = df.collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("count(value) pushes as count(*): the column is non-nullable") {
    ZarrTableProvider.payloadReads.set(0)
    val df = zarr.agg(count(col("value")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ZarrAggScan"), s"count(value) not pushed:\n$plan")
    df.collect()
    assert(ZarrTableProvider.payloadReads.get() == 0)
  }

  test("3D store: pushed count/extrema honor the third axis") {
    import spark.implicits._
    val d3 = TempDirs.create("graft_aggpush3d")
    val spec = GridSpec(Array(5L, 6L, 7L), Array(3, 3, 3))
    val tiles = for (gz <- 0 until 2; gy <- 0 until 2; gx <- 0 until 3)
      yield {
        val dz = math.min(3, 5 - gz * 3); val dy = math.min(3, 6 - gy * 3)
        val dx = math.min(3, 7 - gx * 3)
        Tile(Array(gz, gy, gx), Array(2, 2, 3), Array(dz, dy, dx),
          Array.fill(dz * dy * dx)(1L))
      }
    ZarrIO.write(spark.createDataset(tiles), spec, d3, "<i8", "zlib")
    ZarrTableProvider.payloadReads.set(0)
    val df = spark.read.format("zarr").load(d3)
      .agg(count(lit(1)), max("g2"), max("p0"), max("p2"))
    assert(df.queryExecution.executedPlan.toString.contains("ZarrAggScan"))
    val r = df.collect()(0)
    assert(r.getLong(0) == 5L * 6 * 7)
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getLong(3) == 2L)
    assert(ZarrTableProvider.payloadReads.get() == 0)
  }

  test("a corrupt chunk file fails naming the chunk, not the codec frame") {
    import spark.implicits._
    val dc = TempDirs.create("graft_aggpush_corrupt")
    val spec = GridSpec(Array(6L, 6L), Array(3, 3))
    val tiles = for (gy <- 0 until 2; gx <- 0 until 2) yield
      Tile(Array(gy, gx), Array(2, 2), Array(3, 3),
        Array.tabulate(9)(_.toLong))
    ZarrIO.write(spark.createDataset(tiles), spec, dc, "<i8", "zlib")
    // truncate one chunk mid-payload
    val f = new java.io.File(dc, "1.0")
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    java.nio.file.Files.write(f.toPath, bytes.take(bytes.length / 2))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("zarr").load(dc).agg(sum("value")).collect()
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg.contains("zarr chunk '1.0'") && msg.contains("grid 1,0"),
      s"corrupt chunk not identified: $msg")
  }

  test("grid-grouped count pushes: one metadata row per group") {
    ZarrTableProvider.payloadReads.set(0)
    val df = zarr.groupBy("g0").agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ZarrAggScan"), s"grouped agg not pushed:\n$plan")
    // row 3 is 5 cells tall and missing chunk (3,2): 5 * (7 + 7) cells
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap ==
      Map(0L -> (7L * 19), 1L -> (7L * 19), 2L -> (7L * 19),
        3L -> (5L * 14)))
    assert(ZarrTableProvider.payloadReads.get() == 0)
  }

  test("full grid-key grouping pushes with extrema, pruning composes") {
    ZarrTableProvider.payloadReads.set(0)
    val df = zarr.filter(col("g1") >= 1)
      .groupBy("g0", "g1")
      .agg(count(lit(1)).as("n"), max("p1").as("mxp"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ZarrAggScan"), s"grouped agg not pushed:\n$plan")
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows.size == 7) // 4x2 minus absent (3,2)
    assert(rows((0L, 1L)) == (49L, 6L))
    assert(rows((3L, 1L)) == (35L, 6L)) // 5-tall edge row
    assert(rows((2L, 2L)) == (35L, 4L)) // 5-wide edge col: p1 max 4
    assert(ZarrTableProvider.payloadReads.get() == 0)
  }

  test("limit pushdown plans only enough chunks to cover the limit") {
    // aggregate on top so every planned partition executes exactly once
    // (CollectLimit's incremental execution would re-open chunks)
    ZarrTableProvider.payloadReads.set(0)
    val r10 = zarr.limit(10).agg(count(lit(1)), sum("value")).collect()(0)
    assert(r10.getLong(0) == 10 && r10.getLong(1) > 0)
    assert(ZarrTableProvider.payloadReads.get() == 1,
      s"limit(10) opened ${ZarrTableProvider.payloadReads.get()} chunks")
    // a limit spanning chunks plans just the chunks it needs (49+49 >= 60)
    ZarrTableProvider.payloadReads.set(0)
    val r60 = zarr.limit(60).agg(count(lit(1)), sum("value")).collect()(0)
    assert(r60.getLong(0) == 60)
    assert(ZarrTableProvider.payloadReads.get() == 2,
      s"limit(60) opened ${ZarrTableProvider.payloadReads.get()} chunks")
  }

  test("grouping on in-chunk coordinates falls back to the scan") {
    val df = zarr.groupBy("p0").agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ZarrAggScan"), s"p-grouped agg wrongly pushed:\n$plan")
    // p0 in 0..6; rows 0..2 contribute 19 cells each at every p0, the
    // 5-tall edge row contributes 14 cells only for p0 in 0..4
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(0L) == 3L * 19 + 14 && got(6L) == 3L * 19)
  }
}
