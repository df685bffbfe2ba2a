package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.CCL
import graft.ops.{CCLSegmentation, Relabel}
import graft.tiles.{GridSpec, Tile}

/** Edge geometry the goldens don't cover: a zero-overlap axis (the 3D
  * notebook's `overlaps=[0, 64, 64]` configuration — no halo exchange along
  * one dimension) and degenerate 1-tile-per-axis grids.
  */
class EdgeCaseSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  test("zero overlap on one axis: pipeline == global CCL when objects avoid that axis' cuts") {
    import spark.implicits._
    val H = 8; val W = 12; val CS = 4
    // objects never touch rows 3,4 and 7 (the y-chunk cut rows), so a
    // zero y-overlap is safe; x cuts are covered by overlap 2
    val img = new Array[Long](H * W)
    for ((y, x) <- Seq((0, 0), (0, 1), (1, 0), (1, 1), (2, 5), (2, 6), (5, 3),
      (5, 4), (6, 3), (6, 11), (5, 7), (5, 8)))
      img(y * W + x) = 1L
    val tiles = for (gy <- 0 until H / CS; gx <- 0 until W / CS) yield {
      val data = new Array[Long](CS * CS)
      for (y <- 0 until CS; x <- 0 until CS)
        data(y * CS + x) = img((gy * CS + y) * W + gx * CS + x)
      Tile(Array(gy, gx), Array(H / CS, W / CS), Array(CS, CS), data)
    }
    val out = Relabel.image2labels(spark.createDataset(tiles),
      GridSpec(Array(H.toLong, W.toLong), Array(CS, CS)),
      CCLSegmentation(), Array(0, 2), threshold = 0.25).collect()
    val flat = new Array[Long](H * W)
    for (t <- out; y <- 0 until t.shape(0); x <- 0 until t.shape(1))
      flat((t.loc(0) * CS + y) * W + t.loc(1) * CS + x) = t.data(y * t.shape(1) + x)
    val whole = CCL.label(img, Array(H, W))
    assert(flat.indices.forall(i => (flat(i) == 0L) == (whole(i) == 0L)),
      "foreground mismatch")
    val fwd = scala.collection.mutable.Map.empty[Long, Long]
    val bwd = scala.collection.mutable.Map.empty[Long, Long]
    flat.indices.filter(whole(_) != 0L).foreach { i =>
      assert(fwd.getOrElseUpdate(whole(i), flat(i)) == flat(i))
      assert(bwd.getOrElseUpdate(flat(i), whole(i)) == whole(i))
    }
  }

  test("1xN grid (no neighbors on one axis)") {
    import spark.implicits._
    val tiles = (0 until 3).map { gx =>
      Tile(Array(0, gx), Array(1, 3), Array(4, 4),
        Array.tabulate(16)(i => if (i % 4 >= 2) 1L else 0L))
    }
    val out = Relabel.image2labels(spark.createDataset(tiles),
      GridSpec(Array(4L, 12L), Array(4, 4)),
      CCLSegmentation(), Array(2, 2), threshold = 0.25).collect()
    assert(out.length == 3)
    assert(out.forall(_.shape.toSeq == Seq(4, 4)))
    // stripes connect across tile borders: cols 2,3 of each tile + next
    // tile's 0,1 are separate objects, but cols 2,3 of tile k touch cols
    // 0,1 of nothing (gap at col 0-1 of each tile) -> exactly 3 objects
    val labels = out.flatMap(_.data).filter(_ != 0L).distinct
    assert(labels.length == 3, s"expected 3 stripe objects, got ${labels.toSeq}")
  }

  test("sparse grid fails with a clear error, not an NPE") {
    import spark.implicits._
    // grid claims 2x2 but only 3 tiles are present
    val tiles = Seq((0, 0), (0, 1), (1, 0)).map { case (gy, gx) =>
      Tile(Array(gy, gx), Array(2, 2), Array(4, 4), Array.fill(16)(1L))
    }
    val e = intercept[org.apache.spark.SparkException] {
      Relabel.prepareInput(spark.createDataset(tiles),
        GridSpec(Array(8L, 8L), Array(4, 4)), Array(2, 2)).collect()
    }
    assert(e.getMessage.contains("no tile present") ||
      (e.getCause != null && e.getCause.getMessage.contains("no tile present")))
  }

  test("misbehaving segmentation function fails with a clear message") {
    import spark.implicits._
    val tiles = Seq(Tile(Array(0, 0), Array(1, 1), Array(4, 4),
      Array.fill(16)(1L)))
    val badFn = new graft.ops.SegmentationFn {
      def segment(t: Tile): (Array[Long], Array[Array[Long]]) =
        (Array(1L, 2L), Array.empty)
    }
    val e = intercept[org.apache.spark.SparkException] {
      Relabel.segmentOverlappedInput(spark.createDataset(tiles), badFn).collect()
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg.contains("segmentation function returned 2 values"))
  }

  test("overlap larger than chunk is rejected upfront") {
    import spark.implicits._
    val tiles = Seq(Tile(Array(0, 0), Array(1, 1), Array(4, 4),
      Array.fill(16)(1L)))
    val e = intercept[IllegalArgumentException] {
      Relabel.prepareInput(spark.createDataset(tiles),
        GridSpec(Array(4L, 4L), Array(4, 4)), Array(5, 2))
    }
    assert(e.getMessage.contains("exceeds the chunk size"))
  }
}
