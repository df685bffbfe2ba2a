package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.CCL
import graft.ops.{CCLSegmentation, Relabel}
import graft.tiles.{GridSpec, Tile}

/** End-to-end semantic property (the notebooks' chunked-vs-whole object
  * count check, `examples/test_relabeling_3D.ipynb` cells 24/26, made
  * exact): when every object fits inside the overlap margin — the
  * reference's stated constraint (SURVEY.md §4.1) — the distributed
  * pipeline must produce a labeling isomorphic to single-machine CCL of the
  * whole image: same foreground, same components, bijective label mapping.
  */
class PipelinePropertySpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private val H = 12; private val W = 12; private val CS = 4; private val OV = 2

  /** Random image of small objects (1x1, 1x2, 2x2 — all diameter <= OV). */
  private val imageGen: Gen[Array[Long]] = for {
    n <- Gen.choose(1, 10)
    blobs <- Gen.listOfN(n, for {
      y <- Gen.choose(0, H - 2); x <- Gen.choose(0, W - 2)
      h <- Gen.choose(1, 2); w <- Gen.choose(1, 2)
    } yield (y, x, h, w))
  } yield {
    val img = new Array[Long](H * W)
    // blobs may merge into bigger shapes; keep a safety erosion: skip blobs
    // that would touch an existing blob (so diameters stay <= 2)
    for ((y, x, h, w) <- blobs) {
      val touches = (math.max(0, y - 1) to math.min(H - 1, y + h)).exists(yy =>
        (math.max(0, x - 1) to math.min(W - 1, x + w)).exists(xx =>
          img(yy * W + xx) != 0L))
      if (!touches)
        for (yy <- y until y + h; xx <- x until x + w) img(yy * W + xx) = 1L
    }
    img
  }

  private def toTiles(img: Array[Long]): Seq[Tile] =
    for (gy <- 0 until H / CS; gx <- 0 until W / CS) yield {
      val data = new Array[Long](CS * CS)
      for (y <- 0 until CS; x <- 0 until CS)
        data(y * CS + x) = img((gy * CS + y) * W + gx * CS + x)
      Tile(Array(gy, gx), Array(H / CS, W / CS), Array(CS, CS), data)
    }

  test("chunked pipeline is isomorphic to whole-image CCL for small objects") {
    import spark.implicits._
    (0 until 30).foreach { i =>
      val img = imageGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val tiles = spark.createDataset(toTiles(img))
      val out = Relabel.image2labels(tiles,
        GridSpec(Array(H.toLong, W.toLong), Array(CS, CS)),
        CCLSegmentation(), Array(OV, OV), threshold = 0.25).collect()
      val flat = new Array[Long](H * W)
      for (t <- out; y <- 0 until t.shape(0); x <- 0 until t.shape(1))
        flat((t.loc(0) * CS + y) * W + t.loc(1) * CS + x) = t.data(y * t.shape(1) + x)
      val whole = CCL.label(img, Array(H, W))
      // same foreground
      assert(flat.indices.forall(j => (flat(j) == 0L) == (whole(j) == 0L)),
        s"seed $i: foreground mismatch")
      // bijective label correspondence
      val fwd = scala.collection.mutable.Map.empty[Long, Long]
      val bwd = scala.collection.mutable.Map.empty[Long, Long]
      flat.indices.foreach { j =>
        if (whole(j) != 0L) {
          assert(fwd.getOrElseUpdate(whole(j), flat(j)) == flat(j),
            s"seed $i: component ${whole(j)} split in chunked output")
          assert(bwd.getOrElseUpdate(flat(j), whole(j)) == whole(j),
            s"seed $i: chunked label ${flat(j)} spans two components")
        }
      }
    }
  }
}
