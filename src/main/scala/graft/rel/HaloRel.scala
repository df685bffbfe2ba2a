package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Relabel, SegmentationFn}
import graft.tiles.{GridSpec, Tile}

/** Oracle-checked coverage for O1 (halo expansion) and O2 (user
  * segmentation surface), driven through the REAL operators — the
  * `Halo.expand` shuffle and the `Dataset.map` segmentation hook — and
  * compared against pure-SQL reconstructions of their semantics.
  *
  * The synthetic image here treats [[RelabelRel.pixels]] as CORE 12x12
  * chunks of a 72x48 image (not pre-overlapped), so expansion produces
  * 14/16-sized tiles with the `boundary=None` border rule.
  */
object HaloRel {

  import RelabelRel.{GY, GX, L, OV}

  /** Core tiles carrying foreground=1 pixels (labels forgotten). */
  private[rel] def coreTiles(s: SparkSession, d: String) = {
    import s.implicits._
    RelabelRel.pixelsRaw(s, d)
      .select("gy", "gx", "py", "px")
      .as[(Long, Long, Long, Long)]
      // marker-row densify (py = -1): every grid cell yields a tile even on
      // an input slice with pixel-free tiles — same contract as
      // PipelineOps.tilesFromPixels
      .union(s.range(GY.toLong * GX).map(i => (i / GX, i % GX, -1L, -1L)))
      .groupByKey { case (gy, gx, _, _) => gy * GX + gx }
      .mapGroups { (_, it) =>
        val rows = it.toArray
        val (gy, gx) = (rows.head._1.toInt, rows.head._2.toInt)
        val data = new Array[Long](L * L)
        rows.foreach { case (_, _, py, px) =>
          if (py >= 0) data(py.toInt * L + px.toInt) = 1L
        }
        Tile(Array(gy, gx), Array(GY, GX), Array(L, L), data)
      }
  }

  /** O1 through the real shuffle: expanded tiles exploded to
    * (gy, gx, ey, ex) foreground coordinates in the expanded frame.
    */
  def expandPixels(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Relabel.prepareInput(coreTiles(s, d),
      GridSpec(Array(GY.toLong * L, GX.toLong * L), Array(L, L)),
      Array(OV, OV))
      .flatMap { t =>
        val w = t.shape(1)
        for {
          y <- 0 until t.shape(0); x <- 0 until w
          if t.data(y * w + x) != 0L
        } yield (t.loc(0).toLong, t.loc(1).toLong, y.toLong, x.toLong)
      }.toDF("gy", "gx", "ey", "ex")
  }

  /** SQL reconstruction: own pixels shifted by the low-halo offset, plus
    * each in-grid neighbor's margin strip mapped into the receiver frame.
    * Direction (dy,dx) = where the neighbor sits relative to the receiver.
    */
  val EXPAND_SQL: String = {
    val lowY = s"(CASE WHEN gy > 0 THEN $OV ELSE 0 END)"
    val lowX = s"(CASE WHEN gx > 0 THEN $OV ELSE 0 END)"
    // receiver-frame position of a sender pixel per axis, with d = direction
    // from SENDER to RECEIVER:
    //   d=+1: sender is the chunk below -> its last OV rows become the
    //         receiver's low halo: ey = py - (L-OV)
    //   d= 0: ey = py + lowOff
    //   d=-1: sender is the chunk above -> its first OV rows become the
    //         receiver's high halo: ey = lowOff + L + py
    def pos(dv: String, p: String, low: String) =
      s"""CASE WHEN $dv = 1 THEN $p - ${L - OV}
               WHEN $dv = 0 THEN $p + $low
               ELSE $low + $L + $p END"""
    // membership of the sender pixel in the shipped strip per axis
    def member(dv: String, p: String) =
      s"""(($dv = 1 AND $p >= ${L - OV}) OR ($dv = 0)
          OR ($dv = -1 AND $p < $OV))"""
    RelabelRel.PIXELS_SQL + s""",
    dirs AS (SELECT dy, dx FROM (VALUES (-1),(0),(1)) a(dy),
                                 (VALUES (-1),(0),(1)) b(dx)),
    shipped AS (
      SELECT l.gy + d.dy AS gy, l.gx + d.dx AS gx,
             d.dy AS dy, d.dx AS dx, l.py AS py, l.px AS px
      FROM lab l JOIN dirs d
        ON ${member("d.dy", "l.py")} AND ${member("d.dx", "l.px")}
      WHERE l.gy + d.dy BETWEEN 0 AND ${GY - 1}
        AND l.gx + d.dx BETWEEN 0 AND ${GX - 1})
    SELECT gy, gx,
           ${pos("dy", "py", lowY)} AS ey,
           ${pos("dx", "px", lowX)} AS ex
    FROM shipped"""
  }

  /** The deterministic block-labeling rule as a user segmentation function:
    * O2's `Dataset.map` hook exercised with a kernel DuckDB can mirror
    * (labels = spatial block ids over the EXPANDED frame).
    */
  private[rel] final case class BlockSegmentation() extends SegmentationFn {
    def segment(t: Tile): (Array[Long], Array[Array[Long]]) = {
      val w = t.shape(1)
      val out = new Array[Long](t.data.length)
      var i = 0
      while (i < out.length) {
        if (t.data(i) != 0L) out(i) = (i / w / 3) * 6 + (i % w / 3) + 1
        i += 1
      }
      (out, Array.empty[Array[Long]])
    }
  }

  /** O2 through the real operator with the block kernel. */
  def segmentPixels(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val prepared = Relabel.prepareInput(coreTiles(s, d),
      GridSpec(Array(GY.toLong * L, GX.toLong * L), Array(L, L)),
      Array(OV, OV))
    Relabel.segmentOverlappedInput(prepared, BlockSegmentation())
      .flatMap { t =>
        val w = t.shape(1)
        for {
          y <- 0 until t.shape(0); x <- 0 until w
          v = t.data(y * w + x)
          if v != 0L
        } yield (t.loc(0).toLong, t.loc(1).toLong, y.toLong, x.toLong, v)
      }.toDF("gy", "gx", "ey", "ex", "label")
  }

  def all: Seq[Q] = Seq(
    Q("px_expand", expandPixels, Some(EXPAND_SQL)),
    Q("px_segment", segmentPixels, Some(
      s"""WITH exp0 AS ($EXPAND_SQL)
          SELECT gy, gx, ey, ex, (ey // 3) * 6 + (ex // 3) + 1 AS label
          FROM exp0"""))
  )
}
