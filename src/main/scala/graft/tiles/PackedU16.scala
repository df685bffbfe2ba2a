package graft.tiles

/** uint16 imagery (the reference notebooks' dtype, 2D notebook cell 17)
  * packed little-endian into [[ByteTile]] payloads: the tile's LAST axis is
  * scaled by 2, which makes every box/margin/halo computation in
  * [[graft.ops.ByteHalo]] correct as-is when the caller also scales the
  * last-axis chunk size and overlap — row-major layout means only the last
  * axis has sub-element granularity. 4x less shuffle than int64.
  */
object PackedU16 {

  def pack(t: Tile): ByteTile = {
    val out = new Array[Byte](t.data.length * 2)
    var i = 0
    while (i < t.data.length) {
      val v = t.data(i)
      require(v >= 0L && v <= 0xffffL, s"value $v does not fit uint16")
      out(2 * i) = (v & 0xff).toByte
      out(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val shape = t.shape.clone()
    shape(shape.length - 1) *= 2
    ByteTile(t.loc, t.grid, shape, out)
  }

  def unpack(bt: ByteTile): Tile = {
    val shape = bt.shape.clone()
    require(shape(shape.length - 1) % 2 == 0, "odd byte extent for u16 tile")
    shape(shape.length - 1) /= 2
    val out = new Array[Long](bt.data.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = (bt.data(2 * i) & 0xffL) | ((bt.data(2 * i + 1) & 0xffL) << 8)
      i += 1
    }
    Tile(bt.loc, bt.grid, shape, out)
  }

  /** Scale a spec's last axis by 2 (bytes per uint16). */
  def scaleSpec(spec: GridSpec): GridSpec = {
    val img = spec.imageShape.clone(); img(img.length - 1) *= 2
    val ch = spec.chunk.clone(); ch(ch.length - 1) *= 2
    GridSpec(img, ch)
  }

  def scaleOverlaps(overlaps: Array[Int]): Array[Int] = {
    val o = overlaps.clone(); o(o.length - 1) *= 2
    o
  }
}
