package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{ByteRelabel, CCLSegmentation}
import graft.tiles.{ByteTile, GridSpec}

/** The packed-byte ingest path must be indistinguishable from the int64
  * path on the reference goldens.
  */
class ByteTileSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  test("byte prepare_input matches ovp_input_2d") {
    import spark.implicits._
    val in = spark.createDataset(
      Goldens.localTiles("input_2d", Goldens.grid2d).map(ByteTile.fromTile))
    val got = ByteRelabel.prepareInput(in,
      GridSpec(Array(16L, 12L), Array(4, 4)), Array(2, 2))
      .map(_.toTile).collect().toSeq
    Goldens.assertSameTiles(got, Goldens.localTiles("ovp_input_2d", Goldens.grid2d))
  }

  test("byte image2labels end-to-end matches trim_2d and trim_3d") {
    import spark.implicits._
    for ((file, ovp, golden, spec, ov, thr) <- Seq(
      ("input_2d", "ovp_input_2d", "trim_2d",
        GridSpec(Array(16L, 12L), Array(4, 4)), Array(2, 2), 0.25),
      ("input_3d", "ovp_input_3d", "trim_3d",
        GridSpec(Array(15L, 10L, 15L), Array(5, 5, 5)), Array(2, 2, 2), 0.125))) {
      val grid = if (file == "input_2d") Goldens.grid2d else Goldens.grid3d
      val in = spark.createDataset(
        Goldens.localTiles(file, grid).map(ByteTile.fromTile))
      val got = ByteRelabel.image2labels(in, spec, CCLSegmentation(), ov, thr)
        .collect().toSeq
      Goldens.assertSameTiles(got, Goldens.localTiles(golden, grid))
    }
  }

  test("packed uint16 pipeline matches int64 pipeline on random images") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val H = 8; val W = 12; val CS = 4
    val imgGen = Gen.listOfN(H * W, Gen.frequency(
      (2, Gen.const(0L)), (1, Gen.choose(1L, 65535L))))
    (0 until 10).foreach { seed =>
      val img = imgGen.pureApply(Gen.Parameters.default, Seed(seed.toLong)).toArray
      val tiles = for (gy <- 0 until H / CS; gx <- 0 until W / CS) yield {
        val data = new Array[Long](CS * CS)
        for (y <- 0 until CS; x <- 0 until CS)
          data(y * CS + x) = img((gy * CS + y) * W + gx * CS + x)
        graft.tiles.Tile(Array(gy, gx), Array(H / CS, W / CS), Array(CS, CS), data)
      }
      val spec = GridSpec(Array(H.toLong, W.toLong), Array(CS, CS))
      val viaU16 = ByteRelabel.image2labelsU16(spark.createDataset(tiles),
        spec, CCLSegmentation(), Array(2, 2), 0.25).collect().toSeq
      val viaLong = graft.ops.Relabel.image2labels(spark.createDataset(tiles),
        spec, CCLSegmentation(), Array(2, 2), 0.25).collect().toSeq
      Goldens.assertSameTiles(viaU16, viaLong)
    }
  }
}
