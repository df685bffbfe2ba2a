package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Kernels
import graft.ops.{Halo, SegmentationFn}
import graft.tiles.Tile

/** Incremental tile ingestion: the image2labels front half (halo expand →
  * segment → remove) over a STREAM of tiles arriving in any order across
  * any number of microbatches — the "process chunks as the scanner lands
  * them" mode the batch reference has no counterpart for.
  *
  * The batch halo exchange is a flatMap-to-margin-shards + one groupByKey
  * ([[graft.ops.Halo.expand]]). Streaming keeps exactly that dataflow and
  * swaps the reassembly for `flatMapGroupsWithState`: each receiver
  * location buffers the shards that have arrived; when the count reaches
  * its expected neighborhood size (1 + in-grid neighbors — static grid
  * geometry, not data-dependent), it assembles the overlapped tile, runs
  * the tile-local segment+remove kernels, EMITS, and clears its state.
  * State is O(margins) per in-flight border and shrinks to an O(1)
  * tombstone once a neighborhood completes — the streaming analog of the
  * batch shuffle buffer, with the same O(overlap x surface) volume bound.
  * Duplicate deliveries (at-least-once sources) are absorbed twice over:
  * pending shards dedup on the sender's relative direction, and the
  * tombstone makes emission exactly-once even when a whole neighborhood is
  * redelivered after completing.
  */
object StreamingTiles {

  /** Per-receiver state: `_1` = already emitted (an O(1) tombstone so
    * at-least-once redelivery after completion cannot re-assemble and
    * double-emit); `_2` = shards buffered so far, deduped by the sender's
    * relative direction.
    */
  private type ShardState = (Boolean, List[Halo.Shard])

  /** The merge exchange as a second stateful stage, chained after
    * [[expandSegmentRemoveStream]]: removed tiles flatMap into the SAME
    * parity-pruned merge shards as [[graft.ops.Halo.mergeAndTrim]], each
    * receiver buffers until its (static) expected contribution count is
    * reached, then paints + trims + emits. With both stages in one append-
    * mode query the WHOLE image2labels chain runs incrementally.
    */
  def mergeStream(removed: Dataset[Tile], overlaps: Array[Int]): Dataset[Tile] = {
    val spark = removed.sparkSession
    import spark.implicits._
    val dims = overlaps.length
    val dirs = Halo.directions(dims)
    val ov = overlaps.clone()

    removed
      .flatMap { t =>
        Halo.ownShard(t) +: dirs.collect {
          case d if Halo.inGrid(t.loc, d, t.grid) &&
            Halo.receiverWillMerge(t.loc, d) => Halo.shardOf(t, d, ov)
        }
      }
      .groupByKey(_.destLin)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (lin: Long, it: Iterator[Halo.Shard], state: GroupState[ShardState]) => {
          val (done, have) = state.getOption.getOrElse((false, Nil))
          if (done) Iterator.empty
          else {
            val merged = (have ++ it).groupBy(_.rd.toSeq).map(_._2.head).toList
            val loc = merged.head.destLoc
            val grid = merged.head.grid
            // contributions this receiver will get: itself plus every
            // in-grid sender whose parity rule ships toward it
            val expected = 1 + dirs.count { d =>
              val sender = Array.tabulate(dims)(a => loc(a) + d(a))
              Halo.inGrid(loc, d, grid) &&
                Halo.receiverWillMerge(sender, d.map(-_))
            }
            if (merged.size >= expected) {
              state.update((true, Nil))
              Iterator.single(Halo.assembleMerged(lin, merged.toArray, ov))
            } else {
              state.update((false, merged))
              Iterator.empty
            }
          }
        })
  }

  def expandSegmentRemoveStream(
      tiles: Dataset[Tile],
      overlaps: Array[Int],
      segFn: SegmentationFn,
      threshold: Double): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val dims = overlaps.length
    val dirs = Halo.directions(dims)
    val ov = overlaps.clone()

    tiles
      .flatMap { t =>
        Halo.ownShard(t) +: dirs.collect {
          case d if Halo.inGrid(t.loc, d, t.grid) => Halo.shardOf(t, d, ov)
        }
      }
      .groupByKey(_.destLin)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, it: Iterator[Halo.Shard], state: GroupState[ShardState]) => {
          val (done, have) = state.getOption.getOrElse((false, Nil))
          if (done) Iterator.empty // redelivery after completion
          else {
            val merged = (have ++ it)
              .groupBy(_.rd.toSeq).map(_._2.head).toList // at-least-once dedup
            val loc = merged.head.destLoc
            val grid = merged.head.grid
            val expected = 1 + dirs.count(d => Halo.inGrid(loc, d, grid))
            if (merged.size >= expected) {
              state.update((true, Nil)) // tombstone: emit exactly once
              val expanded = Halo.assembleExpanded(merged.toArray, ov)
              val (labels, classes) = segFn.segment(expanded)
              val segmented = expanded.copy(data = labels, classes = classes)
              Iterator.single(
                Kernels.removeOverlapped(segmented, ov, threshold))
            } else {
              state.update((false, merged))
              Iterator.empty
            }
          }
        })
  }
}
