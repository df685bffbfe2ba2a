package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.{Kernels, Nd, Regions}
import graft.tiles.Tile

/** Halo exchange — the Spark-native equivalent of `da.overlap.overlap`
  * (`relabeling.py:185-190`) and of `da.map_overlap`'s neighbor fetch
  * (`relabeling.py:85-95`).
  *
  * Each tile flatMaps into up to `3^d - 1` margin shards keyed by the
  * destination chunk location, followed by one `groupByKey(linear index)`
  * reassembly — exactly one Exchange per halo, mirroring the reference's two
  * neighbor-communication stages (SURVEY.md §3.1).
  *
  * At 100 TB scale this is the dominant data movement: shard volume is
  * `O(overlap * surface_area)` per tile — a small fraction of tile volume
  * for realistic `overlap << chunk` — and the shuffle is a pure equi-key
  * exchange with bounded fan-in (at most 3^d shards per key), so no skew.
  */
object Halo {

  /** A margin shard in flight. `destLin` = linear index of the receiving
    * chunk (the shuffle key); `rd` = where the *sender* sits relative to the
    * receiver (-1/0/+1 per axis; all-zero = the receiver's own payload);
    * `shape` = shard extent.
    */
  final case class Shard(
      destLin: Long,
      destLoc: Array[Int],
      grid: Array[Int],
      rd: Array[Int],
      shape: Array[Int],
      data: Array[Long],
      classes: Array[Array[Long]]
  )

  /** All non-zero direction vectors in {-1,0,1}^dims. */
  private[graft] def directions(dims: Int): IndexedSeq[Array[Int]] =
    (0 until math.pow(3, dims).toInt)
      .map { k =>
        var x = k
        val d = new Array[Int](dims)
        var a = dims - 1
        while (a >= 0) { d(a) = x % 3 - 1; x /= 3; a -= 1 }
        d
      }
      .filter(_.exists(_ != 0))

  private[graft] def inGrid(loc: Array[Int], d: Array[Int], grid: Array[Int]): Boolean = {
    var a = 0
    while (a < loc.length) {
      val c = loc(a) + d(a)
      if (c < 0 || c >= grid(a)) return false
      a += 1
    }
    true
  }

  /** Slice of `tile` to ship toward direction `d`: per axis, `+1` sends the
    * last `ov`, `-1` the first `ov`, `0` the full extent.
    */
  private def marginBox(tile: Tile, d: Array[Int], overlaps: Array[Int]): Nd.Box = {
    val dims = tile.dims
    val start = new Array[Int](dims)
    val end = new Array[Int](dims)
    var a = 0
    while (a < dims) {
      d(a) match {
        case 1  => start(a) = tile.shape(a) - overlaps(a); end(a) = tile.shape(a)
        case -1 => start(a) = 0; end(a) = overlaps(a)
        case _  => start(a) = 0; end(a) = tile.shape(a)
      }
      a += 1
    }
    Nd.Box(start, end)
  }

  private[graft] def ownShard(t: Tile): Shard =
    Shard(t.linearIndex, t.loc, t.grid, new Array[Int](t.dims), t.shape, t.data, t.classes)

  private[graft] def shardOf(tile: Tile, d: Array[Int], overlaps: Array[Int]): Shard = {
    val dest = Array.tabulate(tile.dims)(a => tile.loc(a) + d(a))
    val box = marginBox(tile, d, overlaps)
    Shard(Regions.linearIndex(dest, tile.grid), dest, tile.grid, d.map(-_), box.shape,
      Nd.sliceBox(tile.data, tile.shape, box),
      if (tile.hasClasses) tile.classes.map(ch => Nd.sliceBox(ch, tile.shape, box))
      else Array.empty[Array[Long]])
  }

  /** O1 halo expansion: input tiles are core (chunk) sized; output tiles
    * carry `overlap` margins copied from every existing neighbor
    * (`boundary=None`: grid borders get no halo).
    */
  def expand(tiles: Dataset[Tile], overlaps: Array[Int]): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val dims = overlaps.length
    val dirs = directions(dims)
    tiles
      .flatMap { t =>
        ownShard(t) +: dirs.collect {
          case d if inGrid(t.loc, d, t.grid) => shardOf(t, d, overlaps)
        }
      }
      .groupByKey(_.destLin)
      .mapGroups { (lin, it) =>
        val all = it.toArray
        require(all.exists(_.rd.forall(_ == 0)),
          s"halo expand: no tile present at linear chunk index $lin — the " +
            "tile table must cover the full grid (dense chunking, like the " +
            "reference's dask arrays)")
        assembleExpanded(all, overlaps)
      }
  }

  private[graft] def assembleExpanded(all: Array[Shard], overlaps: Array[Int]): Tile = {
    val core = all.find(_.rd.forall(_ == 0)).get
    val loc = core.destLoc
    val grid = core.grid
    val dims = loc.length
    val cs = core.shape
    val outShape = Array.tabulate(dims) { a =>
      cs(a) + (if (loc(a) > 0) overlaps(a) else 0) +
        (if (loc(a) < grid(a) - 1) overlaps(a) else 0)
    }
    val lowOff = Array.tabulate(dims)(a => if (loc(a) > 0) overlaps(a) else 0)
    val nCh = core.classes.length
    val out = new Array[Long](Nd.size(outShape))
    val outCls = Array.fill(nCh)(new Array[Long](out.length))
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
      val box = Nd.Box(start, end)
      Nd.pasteBox(out, outShape, box, s.data)
      var ch = 0
      while (ch < nCh) { Nd.pasteBox(outCls(ch), outShape, box, s.classes(ch)); ch += 1 }
    }
    Tile(loc, grid, outShape, out, outCls)
  }

  /** O4 merge: ship each merging region's source pixels as shards over the
    * *already-overlapped* tiles, paint them in with the parity rule, then
    * trim halos. One shuffle, same key as [[expand]].
    *
    * Only shards a receiver's merging-parity regions will consume are sent
    * (`utils.py:101-110`) — roughly half the traffic of a blind exchange.
    */
  def mergeAndTrim(tiles: Dataset[Tile], overlaps: Array[Int]): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val dims = overlaps.length
    val dirs = directions(dims)
    tiles
      .flatMap { t =>
        ownShard(t) +: dirs.collect {
          case d if inGrid(t.loc, d, t.grid) && receiverWillMerge(t.loc, d) =>
            shardOf(t, d, overlaps)
        }
      }
      .groupByKey(_.destLin)
      .mapGroups((lin, it) => assembleMerged(lin, it.toArray, overlaps))
  }

  /** Paint-and-trim one receiver's merge group (shared with the streaming
    * re-expression in [[graft.streaming.StreamingTiles]]).
    */
  private[graft] def assembleMerged(lin: Long, all: Array[Shard],
      overlaps: Array[Int]): Tile = {
    val core = all.find(_.rd.forall(_ == 0)).getOrElse(
      throw new IllegalArgumentException(
        s"merge: no tile present at linear chunk index $lin — dense grid required"))
    val own = Tile(core.destLoc, core.grid, core.shape, core.data, core.classes)
    // region levels (receiver perspective): sender above (rd=+1) feeds a
    // level-1 region, sender below (rd=-1) a level-0 region.
    val byRegion = all.filter(_.rd.exists(_ != 0)).map { s =>
      (s.rd.map { case 1 => 1; case -1 => 0; case _ => Regions.NotVarying }.toSeq, s)
    }.toMap
    val merged = Kernels.mergePaint(own, overlaps, levels => {
      val s = byRegion.getOrElse(levels.toSeq,
        throw new IllegalArgumentException(
          s"merge: missing neighbor shard for region ${levels.mkString(",")} " +
            s"of tile ${own.loc.mkString(",")} — dense grid required"))
      (s.data, s.classes)
    })
    Kernels.trimOverlap(merged, overlaps)
  }

  /** The receiver at `loc + d` uses the shard iff the corresponding region is
    * in its merging set: some varying axis has an odd receiver coordinate.
    */
  private[graft] def receiverWillMerge(loc: Array[Int], d: Array[Int]): Boolean = {
    var a = 0
    while (a < d.length) {
      if (d(a) != 0 && (loc(a) + d(a)) % 2 != 0) return true
      a += 1
    }
    false
  }
}
