package graft.ops

import org.apache.spark.sql.Dataset
import graft.core.{Nd, Regions}
import graft.tiles.{ByteTile, GridSpec, Tile}

/** Byte-payload variant of the O1 halo exchange: identical shard topology
  * to [[Halo.expand]], one-eighth the shuffle bytes for uint8 imagery.
  */
object ByteHalo {

  final case class ByteShard(
      destLin: Long,
      destLoc: Array[Int],
      grid: Array[Int],
      rd: Array[Int],
      shape: Array[Int],
      data: Array[Byte]
  )

  private def inGrid(loc: Array[Int], d: Array[Int], grid: Array[Int]): Boolean = {
    var a = 0
    while (a < loc.length) {
      val c = loc(a) + d(a)
      if (c < 0 || c >= grid(a)) return false
      a += 1
    }
    true
  }

  private def marginBox(t: ByteTile, d: Array[Int], overlaps: Array[Int]): Nd.Box = {
    val dims = t.dims
    val start = new Array[Int](dims)
    val end = new Array[Int](dims)
    var a = 0
    while (a < dims) {
      d(a) match {
        case 1  => start(a) = t.shape(a) - overlaps(a); end(a) = t.shape(a)
        case -1 => start(a) = 0; end(a) = overlaps(a)
        case _  => start(a) = 0; end(a) = t.shape(a)
      }
      a += 1
    }
    Nd.Box(start, end)
  }

  def expand(tiles: Dataset[ByteTile], overlaps: Array[Int]): Dataset[ByteTile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val dims = overlaps.length
    val dirs = Halo.directions(dims)
    tiles
      .flatMap { t =>
        val own = ByteShard(t.linearIndex, t.loc, t.grid,
          new Array[Int](dims), t.shape, t.data)
        own +: dirs.collect {
          case d if inGrid(t.loc, d, t.grid) =>
            val dest = Array.tabulate(dims)(a => t.loc(a) + d(a))
            val box = marginBox(t, d, overlaps)
            ByteShard(Regions.linearIndex(dest, t.grid), dest, t.grid,
              d.map(-_), box.shape, ByteTile.sliceBox(t.data, t.shape, box))
        }
      }
      .groupByKey(_.destLin)
      .mapGroups { (lin, it) =>
        val all = it.toArray
        val core = all.find(_.rd.forall(_ == 0)).getOrElse(
          throw new IllegalArgumentException(
            s"halo expand: no tile present at linear chunk index $lin — dense grid required"))
        val loc = core.destLoc
        val grid = core.grid
        val dims = loc.length
        val cs = core.shape
        val outShape = Array.tabulate(dims) { a =>
          cs(a) + (if (loc(a) > 0) overlaps(a) else 0) +
            (if (loc(a) < grid(a) - 1) overlaps(a) else 0)
        }
        val lowOff = Array.tabulate(dims)(a => if (loc(a) > 0) overlaps(a) else 0)
        val out = new Array[Byte](Nd.size(outShape))
        for (s <- all) {
          val start = new Array[Int](dims)
          val end = new Array[Int](dims)
          var a = 0
          while (a < dims) {
            s.rd(a) match {
              case -1 => start(a) = 0; end(a) = overlaps(a)
              case 1  => start(a) = outShape(a) - overlaps(a); end(a) = outShape(a)
              case _  => start(a) = lowOff(a); end(a) = lowOff(a) + cs(a)
            }
            a += 1
          }
          ByteTile.pasteBox(out, outShape, Nd.Box(start, end), s.data)
        }
        ByteTile(loc, grid, outShape, out)
      }
  }
}

/** Byte-ingest pipeline heads mirroring [[Relabel]]. */
object ByteRelabel {

  /** O1 over packed image tiles. */
  def prepareInput(tiles: Dataset[ByteTile], spec: GridSpec,
                   overlaps: Array[Int]): Dataset[ByteTile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val chunk = spec.chunk
    Relabel.validateOverlaps(overlaps, chunk)
    ByteHalo.expand(tiles.map(t => ByteTile.padTo(t, chunk)), overlaps)
  }

  /** O7 from packed uint16 imagery (the reference notebooks' dtype):
    * little-endian 2-byte pixels ride the byte halo with the last axis
    * scaled, then widen locally. 4x less shuffle than int64.
    */
  def image2labelsU16(tiles: Dataset[Tile], spec: GridSpec,
                      segFn: SegmentationFn, overlaps: Array[Int],
                      threshold: Double = 0.05): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    import graft.tiles.PackedU16
    Relabel.validateOverlaps(overlaps, spec.chunk)
    val packed = tiles.map(PackedU16.pack _)
    val prepared = ByteHalo.expand(
      packed.map(t => ByteTile.padTo(t, PackedU16.scaleSpec(spec).chunk)),
      PackedU16.scaleOverlaps(overlaps)).map(PackedU16.unpack _)
    val segmented = Relabel.segmentOverlappedInput(prepared, segFn)
    val removed = Relabel.removeOverlappedLabels(segmented, overlaps, threshold)
    val merged = Relabel.mergeOverlappedTiles(removed, overlaps)
    Relabel.cropToImage(merged, spec)
  }

  /** O7 from packed uint8 imagery: the halo exchange moves bytes; tiles
    * widen to int64 locally at the segmentation boundary.
    */
  def image2labels(tiles: Dataset[ByteTile], spec: GridSpec,
                   segFn: SegmentationFn, overlaps: Array[Int],
                   threshold: Double = 0.05): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val prepared = prepareInput(tiles, spec, overlaps).map(_.toTile)
    val segmented = Relabel.segmentOverlappedInput(prepared, segFn)
    val removed = Relabel.removeOverlappedLabels(segmented, overlaps, threshold)
    val merged = Relabel.mergeOverlappedTiles(removed, overlaps)
    Relabel.cropToImage(merged, spec)
  }
}
