package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Relabel
import graft.tiles.{GridSpec, Tile}

/** Remaining operator-surface gate coverage:
  *
  *  - `px_segment_aux`: O2's aligned-auxiliary-table variant
  *    (`relabeling.py:28-36` zipped dask-array kwargs == equi-join on chunk
  *    location) through `Relabel.segmentWithAux`.
  *  - `px_sort`: O10 dense re-rank through the engine's broadcast map over
  *    the full-pipeline output.
  *  - `px_sort_dist`: the same oracle through the DISTRIBUTED O10 path
  *    (billion-label spaces: no driver round-trip).
  *  - `px_overlap_diag`: the overlap-sufficiency diagnostic — labels
  *    wider than the overlap margin, which the parity rule silently
  *    splits, detected per tile.
  *  - `px_pipeline_classes`: the classes channel carried through
  *    segment -> remove (survival mask) -> merge (paint mask) and verified
  *    against the class rule reconstructed from the global id.
  */
object ChainExtras {

  import RelabelRel.{GY, GX, L, OV, THRESHOLD, OFFSET_UNIT}

  private val spec2 = GridSpec(Array(GY.toLong * L, GX.toLong * L), Array(L, L))

  /** Aux table: a checkerboard mask over the same grid (deterministic). */
  private def auxTiles(s: SparkSession, d: String) = {
    import s.implicits._
    HaloRel.coreTiles(s, d).map { t =>
      val w = t.shape(1)
      val data = Array.tabulate(t.data.length)(i =>
        if ((i / w + i % w) % 2 == 0) 1L else 0L)
      t.copy(data = data)
    }
  }

  /** O2 with aux: label = block id where BOTH image and aux mask are set. */
  def segmentAux(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val img = Relabel.prepareInput(HaloRel.coreTiles(s, d), spec2, Array(OV, OV))
    val aux = Relabel.prepareInput(auxTiles(s, d), spec2, Array(OV, OV))
    val seg = Relabel.segmentWithAux(img, aux, (t: Tile, a: Tile) => {
      val w = t.shape(1)
      val out = new Array[Long](t.data.length)
      var i = 0
      while (i < out.length) {
        if (t.data(i) != 0L && a.data(i) != 0L)
          out(i) = (i / w / 3) * 6 + (i % w / 3) + 1
        i += 1
      }
      (out, Array.empty[Array[Long]])
    })
    seg.flatMap { t =>
      val w = t.shape(1)
      for {
        y <- 0 until t.shape(0); x <- 0 until w
        v = t.data(y * w + x)
        if v != 0L
      } yield (t.loc(0).toLong, t.loc(1).toLong, y.toLong, x.toLong, v)
    }.toDF("gy", "gx", "ey", "ex", "label")
  }

  /** The aux checkerboard in the expanded frame is checkerboard over GLOBAL
    * core coordinates; both tiles expand identically, so the mask at
    * expanded (ey,ex) is the checkerboard of the SOURCE core pixel — which
    * for halo pixels is the neighbor's core pixel. Global parity is
    * invariant: (gy*L + (ey - low)) + (gx*L + (ex - low)) has the same
    * parity as the sender's core (py + px) for every shipped margin, so the
    * SQL can evaluate it on receiver-frame coordinates directly.
    */
  val SEGMENT_AUX_SQL: String = {
    def low(g: String) = s"(CASE WHEN $g > 0 THEN $OV ELSE 0 END)"
    s"""WITH exp0 AS (${HaloRel.EXPAND_SQL})
    SELECT gy, gx, ey, ex, (ey // 3) * 6 + (ex // 3) + 1 AS label
    FROM exp0
    WHERE ((gy * $L + ey - ${low("gy")}) + (gx * $L + ex - ${low("gx")})) % 2 = 0"""
  }

  /** O10 through the engine: dense re-rank of the full-pipeline output. */
  def sortPixels(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val merged = Relabel.image2labels(HaloRel.coreTiles(s, d), spec2,
      HaloRel.BlockSegmentation(), Array(OV, OV), THRESHOLD)
    Relabel.sortLabelIndices(merged).flatMap { t =>
      val w = t.shape(1)
      for {
        y <- 0 until t.shape(0); x <- 0 until w
        v = t.data(y * w + x)
        if v != 0L
      } yield (t.loc(0).toLong, t.loc(1).toLong, y.toLong, x.toLong, v)
    }.toDF("gy", "gx", "py", "px", "rank")
  }

  /** O10 through the DISTRIBUTED rank path ([[Relabel.sortLabelIndicesDistributed]]):
    * the variant that survives billion-label spaces (range-partitioned sort
    * + zipWithIndex + cogroup remap, no driver round-trip), driver-gated
    * against the SAME oracle as the broadcast path so the scale-safe
    * implementation is hash-checked, not just differential-spec'd. The
    * pipeline output is persisted first — the distributed sort reads its
    * input three times (rank build, join probe, sort sampling) and the
    * label sets must be observed consistently across those passes.
    */
  def sortPixelsDistributed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val merged = Relabel.image2labels(HaloRel.coreTiles(s, d), spec2,
      HaloRel.BlockSegmentation(), Array(OV, OV), THRESHOLD)
    // persist BEFORE the call: the distributed sort runs jobs eagerly
    // (range sampling + zipWithIndex), so a lazy releaseAfterAction persist
    // would land after those passes already recomputed the lineage
    merged.persist()
    val out = Relabel.sortLabelIndicesDistributed(merged).flatMap { t =>
      val w = t.shape(1)
      for {
        y <- 0 until t.shape(0); x <- 0 until w
        v = t.data(y * w + x)
        if v != 0L
      } yield (t.loc(0).toLong, t.loc(1).toLong, y.toLong, x.toLong, v)
    }.toDF("gy", "gx", "py", "px", "rank")
    graft.Caching.releaseAfterAction(out, merged)
  }

  val SORT_SQL: String = s"""
    WITH full0 AS (${FullChainRel.SQL}),
    ranks AS (
      SELECT gid, CAST(dense_rank() OVER (ORDER BY gid) AS BIGINT) - 1 AS rank
      FROM (SELECT DISTINCT gid FROM full0 UNION SELECT CAST(0 AS BIGINT)))
    SELECT f.gy, f.gx, f.py, f.px, r.rank
    FROM full0 f JOIN ranks r ON f.gid = r.gid
    WHERE r.rank != 0"""

  /** Overlap-sufficiency diagnostic gate ([[Relabel.overlapSufficiency]]):
    * the label field carries horizontal stripe objects 20 px tall — taller
    * than the 16-px expanded tile (2 + 12 + 2), so some stripes touch BOTH
    * y-margin faces of an interior tile: exactly the objects the parity
    * rule would silently split because they exceed what the overlap can
    * cover. The 3-px stripe width stays inside the x margins, so the x axis
    * must report nothing — the oracle reconstructs both axes' face
    * conditions over the expanded frame, pinning that a face only exists
    * where a neighbor shipped a halo.
    */
  def overlapDiag(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tiles = s.range(GY.toLong * GX).map { k =>
      val gy = (k / GX).toInt; val gx = (k % GX).toInt
      val data = new Array[Long](L * L)
      var i = 0
      while (i < data.length) {
        val yg = gy * L + i / L; val xg = gx * L + i % L
        data(i) = (yg / 20).toLong * 16 + xg / 3 + 1
        i += 1
      }
      Tile(Array(gy, gx), Array(GY, GX), Array(L, L), data)
    }
    val prepared = Relabel.prepareInput(tiles, spec2, Array(OV, OV))
    Relabel.overlapSufficiency(prepared, Array(OV, OV))
      .map { case (lin, axis, label) =>
        (lin / GX, lin % GX, axis.toLong, label) }
      .toDF("gy", "gx", "axis", "label")
  }

  val OVERLAP_DIAG_SQL: String = {
    def low(g: String) = s"(CASE WHEN $g > 0 THEN $OV ELSE 0 END)"
    s"""
    WITH grid AS (
      SELECT ty.y AS gy, tx.x AS gx
      FROM range(0, $GY) ty(y), range(0, $GX) tx(x)),
    epix AS (
      SELECT g.gy, g.gx, py.e AS ey, px.e AS ex,
             g.gy * $L + py.e - ${low("g.gy")} AS yg,
             g.gx * $L + px.e - ${low("g.gx")} AS xg
      FROM grid g, range(0, ${L + 2 * OV}) py(e), range(0, ${L + 2 * OV}) px(e)
      WHERE py.e < $L + ${low("g.gy")} + (CASE WHEN g.gy < ${GY - 1} THEN $OV ELSE 0 END)
        AND px.e < $L + ${low("g.gx")} + (CASE WHEN g.gx < ${GX - 1} THEN $OV ELSE 0 END)),
    lab AS (
      SELECT gy, gx, ey, ex, (yg // 20) * 16 + xg // 3 + 1 AS label
      FROM epix)
    SELECT gy, gx, CAST(0 AS BIGINT) AS axis, label FROM lab
    GROUP BY gy, gx, label
    HAVING count(*) FILTER (WHERE gy > 0 AND ey < $OV) > 0
       AND count(*) FILTER (WHERE gy < ${GY - 1} AND ey >= ${low("gy")} + $L) > 0
    UNION ALL
    SELECT gy, gx, CAST(1 AS BIGINT) AS axis, label FROM lab
    GROUP BY gy, gx, label
    HAVING count(*) FILTER (WHERE gx > 0 AND ex < $OV) > 0
       AND count(*) FILTER (WHERE gx < ${GX - 1} AND ex >= ${low("gx")} + $L) > 0"""
  }

  /** Classes channel end-to-end: class = 1 + label % 2 at segmentation,
    * masked by survival and painted with the merge — so the final class at
    * a pixel is the rule applied to the OWNING label, recoverable from the
    * global id (`label = gid % OFFSET_UNIT`).
    */
  def pipelineClasses(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val prepared = Relabel.prepareInput(HaloRel.coreTiles(s, d), spec2, Array(OV, OV))
    val seg = Relabel.segmentOverlappedInput(prepared,
      new graft.ops.SegmentationFn {
        def segment(t: Tile): (Array[Long], Array[Array[Long]]) = {
          val (labels, _) = HaloRel.BlockSegmentation().segment(t)
          (labels, Array(labels.map(l => if (l != 0L) 1L + l % 2 else 0L)))
        }
      })
    val removed = Relabel.removeOverlappedLabels(seg, Array(OV, OV), THRESHOLD)
    val merged = Relabel.mergeOverlappedTiles(removed, Array(OV, OV))
    merged.flatMap { t =>
      val w = t.shape(1)
      for {
        y <- 0 until t.shape(0); x <- 0 until w
        v = t.data(y * w + x)
        if v != 0L
      } yield (t.loc(0).toLong, t.loc(1).toLong, y.toLong, x.toLong, v,
        t.classes(0)(y * w + x))
    }.toDF("gy", "gx", "py", "px", "gid", "class")
  }

  val PIPELINE_CLASSES_SQL: String = s"""
    WITH full0 AS (${FullChainRel.SQL})
    SELECT gy, gx, py, px, gid, 1 + (gid % $OFFSET_UNIT) % 2 AS class
    FROM full0"""

  def all: Seq[Q] = Seq(
    Q("px_segment_aux", segmentAux, Some(SEGMENT_AUX_SQL)),
    Q("px_sort", sortPixels, Some(SORT_SQL)),
    Q("px_sort_dist", sortPixelsDistributed, Some(SORT_SQL)),
    Q("px_overlap_diag", overlapDiag, Some(OVERLAP_DIAG_SQL)),
    Q("px_pipeline_classes", pipelineClasses, Some(PIPELINE_CLASSES_SQL)))
}
