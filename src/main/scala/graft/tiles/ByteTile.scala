package graft.tiles

import graft.core.Nd

/** Packed image tile: uint8 pixel payload (`BinaryType` on the wire) — 8x
  * smaller than the int64 label representation through the O1 halo
  * exchange, which is the only stage that shuffles raw image data. Labels
  * genuinely need int32/int64 (chunk-disjoint global offsets), so the
  * pipeline widens to [[Tile]] right after expansion, locally.
  *
  * For uint16 sources, pack two bytes per pixel upstream or widen early;
  * the shuffle saving is then 4x.
  */
final case class ByteTile(
    loc: Array[Int],
    grid: Array[Int],
    shape: Array[Int],
    data: Array[Byte]
) {
  def dims: Int = loc.length
  def linearIndex: Long = graft.core.Regions.linearIndex(loc, grid)

  /** Widen to the int64 tile (unsigned interpretation). */
  def toTile: Tile = {
    val out = new Array[Long](data.length)
    var i = 0
    while (i < data.length) { out(i) = data(i) & 0xffL; i += 1 }
    Tile(loc, grid, shape, out)
  }
}

object ByteTile {
  /** Narrow an image tile whose values all fit uint8. */
  def fromTile(t: Tile): ByteTile = {
    val out = new Array[Byte](t.data.length)
    var i = 0
    while (i < t.data.length) {
      val v = t.data(i)
      require(v >= 0L && v <= 255L, s"value $v does not fit uint8")
      out(i) = v.toByte
      i += 1
    }
    ByteTile(t.loc, t.grid, t.shape, out)
  }

  /** Byte variants of the Nd box ops (kept tiny and local). */
  def sliceBox(src: Array[Byte], srcShape: Array[Int], box: Nd.Box): Array[Byte] = {
    val out = new Array[Byte](box.numel)
    var i = 0
    Nd.foreachIndex(srcShape, box) { flat => out(i) = src(flat); i += 1 }
    out
  }

  def pasteBox(dst: Array[Byte], dstShape: Array[Int], box: Nd.Box,
               payload: Array[Byte]): Unit = {
    var i = 0
    Nd.foreachIndex(dstShape, box) { flat => dst(flat) = payload(i); i += 1 }
  }

  def padTo(tile: ByteTile, target: Array[Int]): ByteTile = {
    if (java.util.Arrays.equals(tile.shape, target)) return tile
    val out = new Array[Byte](Nd.size(target))
    pasteBox(out, target, Nd.Box(new Array[Int](tile.dims), tile.shape.clone()),
      tile.data)
    tile.copy(shape = target, data = out)
  }
}
