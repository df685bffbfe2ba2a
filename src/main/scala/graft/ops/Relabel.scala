package graft.ops

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col
import org.apache.spark.util.LongAccumulator
import graft.core.{CCL, Kernels}
import graft.tiles.{GridSpec, Tile}

/** The user-supplied segmentation function (the reference's central
  * extension point, `relabeling.py:14-47`): an arbitrary per-tile
  * image -> labels kernel, optionally also producing per-object class
  * channels. Runs as plain JVM code inside `Dataset.map` on executors.
  */
trait SegmentationFn extends Serializable {
  /** Return (labels, classes). `labels` must use 0 for background and values
    * representable in int32 (they are offset into disjoint int64 ranges
    * downstream). `classes` empty when the function predicts no classes.
    */
  def segment(tile: Tile): (Array[Long], Array[Array[Long]])
}

/** Built-in connectivity-1 connected-component labeling, the Spark-side
  * stand-in for the reference tests' `skimage.measure.label`
  * (`tests/fixtures.py:12-28`).
  */
final case class CCLSegmentation(returnsClasses: Boolean = false) extends SegmentationFn {
  def segment(tile: Tile): (Array[Long], Array[Array[Long]]) = {
    val labels = CCL.label(tile.data, tile.shape)
    val classes =
      if (returnsClasses) Array(labels.map(v => if (v != 0L) 1L else 0L))
      else Array.empty[Array[Long]]
    (labels, classes)
  }
}

/** Pass-through segmentation for inputs that already carry labels — the
  * `labels2geojson` ingest shape (`relabeling.py:245-276`, where the image
  * is labeled upstream). Composing it with the streaming front half
  * re-expresses O8's prepare -> remove incrementally.
  */
final case class IdentitySegmentation() extends SegmentationFn {
  def segment(tile: Tile): (Array[Long], Array[Array[Long]]) =
    (tile.data, tile.classes)
}

/** Public operator surface (O1-O10, SURVEY.md §2), re-expressed over the tile
  * table. Everything is a lazy `Dataset` transformation; an action
  * (`collect`, `write`, `count`) is the `.compute()` boundary.
  */
object Relabel {

  private[ops] def validateOverlaps(overlaps: Array[Int], chunk: Array[Int]): Unit =
    overlaps.indices.foreach { a =>
      require(overlaps(a) >= 0 && overlaps(a) <= chunk(a),
        s"overlap ${overlaps(a)} on axis $a exceeds the chunk size " +
          s"${chunk(a)} — a halo cannot be wider than its source chunk")
    }

  /** O1 `prepare_input` (`relabeling.py:166-192`): zero-pad ragged high-edge
    * tiles to the chunk size (pad is tile-local — no shuffle), then
    * halo-expand every tile by `overlaps` from its neighbors (one shuffle).
    *
    * Input tiles must be chunk-aligned: tile (i,j) holds image block
    * [i*cs, (i+1)*cs) x [j*cs, (j+1)*cs) clipped to the image.
    */
  def prepareInput(tiles: Dataset[Tile], spec: GridSpec, overlaps: Array[Int]): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val chunk = spec.chunk
    validateOverlaps(overlaps, chunk)
    val padded = tiles.map(t => Kernels.padTo(t, chunk))
    Halo.expand(padded, overlaps)
  }

  /** O2 `segment_overlapped_input` (`relabeling.py:14-47`): embarrassingly
    * parallel user kernel per halo-expanded tile.
    */
  def segmentOverlappedInput(tiles: Dataset[Tile], segFn: SegmentationFn): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles.map { t =>
      val (labels, classes) = segFn.segment(t)
      require(labels.length == t.numel,
        s"segmentation function returned ${labels.length} values for a " +
          s"${t.shape.mkString("x")} tile (${t.numel} pixels) at ${t.loc.mkString(",")}")
      classes.zipWithIndex.foreach { case (ch, i) =>
        require(ch.length == t.numel,
          s"classes channel $i has ${ch.length} values, expected ${t.numel}")
      }
      t.copy(data = labels, classes = classes)
    }
  }

  /** O2 with aligned auxiliary tile tables (the reference's dask-array
    * `segmentation_fn_kwargs`, `relabeling.py:28-36`): an equi-join on the
    * chunk location, then the two-argument kernel.
    */
  def segmentWithAux(tiles: Dataset[Tile], aux: Dataset[Tile],
                     fn: (Tile, Tile) => (Array[Long], Array[Array[Long]])): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles
      .groupByKey(_.linearIndex)
      .cogroup(aux.groupByKey(_.linearIndex)) { (lin, ts, as) =>
        val auxTiles = as.toArray
        require(auxTiles.nonEmpty || !ts.hasNext,
          s"aligned aux table has no tile at linear chunk index $lin — " +
            "aux must cover the same grid as the image (the reference zips " +
            "aligned dask arrays chunk-wise, relabeling.py:28-36)")
        ts.map { t =>
          val (labels, classes) = fn(t, auxTiles.head)
          t.copy(data = labels, classes = classes)
        }
      }
  }

  /** O3 `remove_overlapped_labels` (`relabeling.py:50-76`): chunk-local —
    * no shuffle. Default threshold 0.5 as in the reference signature.
    */
  def removeOverlappedLabels(tiles: Dataset[Tile], overlaps: Array[Int],
                             threshold: Double = 0.5): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles.map(t => Kernels.removeOverlapped(t, overlaps, threshold))
  }

  /** Overlap-sufficiency diagnostic over prepared (halo-expanded, possibly
    * segmented) tiles: one row per (tile, axis, label) whose pixels touch
    * both opposite margin faces of that tile — objects larger than the
    * overlap, which O3's parity rule will split SILENTLY (the reference's
    * undetected correctness constraint, SURVEY §4.1). Run it on the stage
    * feeding [[removeOverlappedLabels]] when validating an overlap setting:
    * any row means `overlaps` is too small for the objects present. Tile-
    * local (no shuffle); at 100 TB this is a free rider on the segmented
    * stage, aggregable to a per-dataset violation count.
    */
  def overlapSufficiency(tiles: Dataset[Tile], overlaps: Array[Int])
      : Dataset[(Long, Int, Long)] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles.flatMap { t =>
      Kernels.marginSpanViolations(t, overlaps).iterator
        .map { case (axis, label) => (t.linearIndex, axis, label) }
    }
  }

  /** O4 `merge_overlapped_tiles` (`relabeling.py:79-99`): one neighbor
    * exchange + parity paint + halo trim. Output tiles are core-sized.
    */
  def mergeOverlappedTiles(tiles: Dataset[Tile], overlaps: Array[Int]): Dataset[Tile] =
    Halo.mergeAndTrim(tiles, overlaps)

  /** Session conf key: label-cardinality cap for [[sortLabelIndices]]'s
    * broadcast rank map. The driver materializes at most cap+1 labels (a
    * `limit` probe, never the unbounded label space), and a space that
    * exceeds the cap auto-switches to [[sortLabelIndicesDistributed]] —
    * same output contract, no driver round-trip — in the AQE spirit of
    * deciding the physical strategy from the observed size (the
    * `componentsDriverMaxEdges` precedent). Default 4M labels: the rank
    * map is a boxed java HashMap (~100 B/entry → ~400 MB transient on
    * the driver plus one broadcast copy per executor JVM), which fits
    * default driver heaps; the reference's own collect
    * (`relabeling.py:331`) has no such guard, so a 100× label space
    * OOMs there and silently switches strategy here.
    */
  val SortBroadcastCapKey = "graft.relabel.sortBroadcastMaxLabels"

  /** O10 `sort_label_indices` (`relabeling.py:312-346`): global distinct of
    * the label space (eager, like the reference's `da.unique(...).compute()`
    * at `relabeling.py:331`) broadcast back as a dense-rank map. Persist the
    * input first if it is expensive to recompute — the reference's docstring
    * gives the same advice. Label spaces above [[SortBroadcastCapKey]]
    * never reach the driver: the call degrades to the distributed variant.
    */
  def sortLabelIndices(tiles: Dataset[Tile]): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val cap = spark.conf.get(SortBroadcastCapKey, "4000000").toLong
    require(cap > 0, s"$SortBroadcastCapKey must be positive, got $cap")
    val probeN = math.min(cap, Int.MaxValue - 1L).toInt + 1
    // per-tile distinct first: shrinks the shuffle to O(labels), not O(pixels)
    // COST NOTE (accepted trade, r13 ADVICE): limit(cap+1) compiles to
    // CollectLimit, whose below-cap path (the limit is never satisfied, so
    // it exhausts the input) runs ~log4(P) scale-up jobs (1, 4, 16, ...
    // reduce partitions). The upstream per-tile-distinct MAP stage is one
    // shared shuffle write reused by every retry — each retry re-reads
    // shuffled label ids (O(distinct labels), tiny vs the pixel scan), so
    // the worst case over the old unbounded collect() is a few extra
    // reduce-side passes over the label set, bought against the driver-OOM
    // guarantee. A count()-first probe would pin it to exactly two passes
    // but pays a full extra aggregate even for tiny label spaces — the
    // common case here.
    val probe = tiles
      .flatMap(t => t.data.distinct.iterator)
      .distinct()
      .limit(probeN)
      .collect()
    if (probe.length >= probeN)
      // over the cap: the probe saw cap+1 distinct labels, so the full
      // collect would be the driver OOM this guard exists to prevent
      return sortLabelIndicesDistributed(tiles)
    val distinctLabels = probe.sorted
    val rank = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    var i = 0L
    distinctLabels.foreach { l => rank.put(l, i); i += 1 }
    val bc = spark.sparkContext.broadcast(rank)
    tiles.map(t => Kernels.sortRemap(t, bc.value))
  }

  /** O10 without the driver round-trip: the reference (and
    * [[sortLabelIndices]]) collects the distinct label set to the driver —
    * fine for millions of labels, fatal for billions. This variant keeps
    * everything distributed: global distinct -> range-partitioned sort with
    * `zipWithIndex` (two passes, no single-partition sort) -> per-tile rank
    * maps via an equi-join on the tile's own distinct labels -> cogroup
    * remap. More shuffles than the broadcast path; choose by label-space
    * size.
    */
  def sortLabelIndicesDistributed(tiles: Dataset[Tile]): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    // NOTE: like the broadcast variant (and the reference, which computes
    // eagerly at `relabeling.py:331`), this runs jobs at call time (range
    // sampling + zipWithIndex). Persist `tiles` first if its lineage is
    // expensive or non-deterministic — the rank table and the remap pass
    // must observe the same label sets.
    // read three times below (rank build, join probe, implicit in sort
    // sampling); tiny (O(distinct labels per tile)). Persist EAGERLY here —
    // the sortBy sampling and zipWithIndex jobs below run at call time, and
    // they must populate (then reuse) the cache, not each recompute the
    // tiles lineage. releaseAfterAction's own persist() is then a no-op;
    // its listener still releases after the remapped result's action.
    val tileLabels = tiles.flatMap(t =>
      t.data.distinct.iterator.map(l => (t.linearIndex, l)))
      .toDF("lin", "label")
      .persist()
    val ranks = tileLabels.select("label").distinct().as[Long]
      .rdd.sortBy(identity).zipWithIndex().toDF("label", "rank")
    val perTile = tileLabels.join(ranks, "label")
      .select(col("lin"), col("label"), col("rank"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (lin, it) =>
        (lin, it.map { case (_, l, r) => (l, r) }.toArray)
      }
    graft.Caching.releaseAfterAction(tiles
      .groupByKey(_.linearIndex)
      .cogroup(perTile.groupByKey(_._1)) { (lin, ts, rs) =>
        val rank = new java.util.HashMap[java.lang.Long, java.lang.Long]()
        rs.foreach(_._2.foreach { case (l, r) => rank.put(l, r) })
        // remap every tile in the group (duplicated locations are remapped,
        // not dropped) and fail loudly on rank misses rather than NPE-ing —
        // a miss means the tiles lineage diverged between passes
        ts.map { t =>
          val checked = new java.util.HashMap[java.lang.Long, java.lang.Long]()
          t.data.foreach { l =>
            if (!checked.containsKey(l)) {
              val r = rank.get(l)
              require(r != null,
                s"label $l of tile $lin has no rank: non-deterministic input " +
                  "lineage? persist the tiles Dataset before sorting")
              checked.put(l, r)
            }
          }
          Kernels.sortRemap(t, checked)
        }
      }, tileLabels)
  }

  /** Un-pad: crop high-edge tiles back to the original image extent
    * (`relabeling.py:237-240`); tile-local. Shared by every image2labels
    * variant so the crop rule cannot diverge between ingest paths.
    */
  def cropToImage(tiles: Dataset[Tile], spec: GridSpec): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val chunk = spec.chunk
    val imageShape = spec.imageShape
    tiles.map { t =>
      val target = Array.tabulate(t.dims) { a =>
        val remaining = imageShape(a) - t.loc(a).toLong * chunk(a)
        math.min(chunk(a).toLong, remaining).toInt
      }
      Kernels.cropTo(t, target)
    }
  }

  /** O7 `image2labels` (`relabeling.py:195-242`): the flagship composition.
    * Exactly two shuffles end-to-end (the two halo exchanges), like the
    * reference's two neighbor-communication stages.
    *
    * `overlapViolations`, when given, counts the objects whose pixels span
    * both opposite margin faces of a tile — objects LARGER than the
    * overlap, which O3's parity rule will split silently (the reference's
    * undetected correctness constraint, SURVEY §4.1; [[overlapSufficiency]]
    * is the standalone row-per-violation form). It rides the segmented
    * stage for free — no extra pass, no shuffle — and fills when the
    * returned Dataset's ACTION runs (standard Spark accumulator
    * semantics: read it after the write/collect, treat it as at-least-once
    * under task retries — a diagnostic trigger, not an exact metric; any
    * value > 0 means `overlaps` is too small for the objects present).
    */
  def image2labels(tiles: Dataset[Tile], spec: GridSpec, segFn: SegmentationFn,
                   overlaps: Array[Int], threshold: Double = 0.05,
                   overlapViolations: Option[LongAccumulator] = None): Dataset[Tile] = {
    val prepared = prepareInput(tiles, spec, overlaps)
    val segmented = segmentOverlappedInput(prepared, segFn)
    val audited = overlapViolations.fold(segmented) { acc =>
      val spark = segmented.sparkSession
      import spark.implicits._
      segmented.map { t =>
        val v = Kernels.marginSpanViolations(t, overlaps).length
        if (v > 0) acc.add(v.toLong)
        t
      }
    }
    val removed = removeOverlappedLabels(audited, overlaps, threshold)
    val merged = mergeOverlappedTiles(removed, overlaps)
    cropToImage(merged, spec)
  }

  /** O8 `labels2geojson` (`relabeling.py:245-276`): (optional prepare) ->
    * remove -> annotate. Default threshold 0.5 (`relabeling.py:246`), vs
    * 0.05 for image2labels.
    */
  def labels2geojson(tiles: Dataset[Tile], spec: GridSpec, overlaps: Array[Int],
                     threshold: Double = 0.5,
                     objectClasses: Option[Map[Long, String]] = None,
                     preOverlapped: Boolean = false)
      : Dataset[graft.geojson.Annotate.TileAnnotation] = {
    val prepared = if (preOverlapped) tiles else prepareInput(tiles, spec, overlaps)
    val removed = removeOverlappedLabels(prepared, overlaps, threshold)
    graft.geojson.Annotate.annotateLabeledTiles(removed, overlaps, objectClasses)
  }

  /** O9 `image2geojson` (`relabeling.py:279-309`): prepare -> segment ->
    * labels2geojson(pre_overlapped = true).
    */
  def image2geojson(tiles: Dataset[Tile], spec: GridSpec, segFn: SegmentationFn,
                    overlaps: Array[Int], threshold: Double = 0.5,
                    objectClasses: Option[Map[Long, String]] = None)
      : Dataset[graft.geojson.Annotate.TileAnnotation] = {
    val prepared = prepareInput(tiles, spec, overlaps)
    val segmented = segmentOverlappedInput(prepared, segFn)
    labels2geojson(segmented, spec, overlaps, threshold, objectClasses,
      preOverlapped = true)
  }
}
