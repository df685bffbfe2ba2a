package graft.core

/** Row-major N-d index math over flat arrays (dims = 2 or 3 in practice).
  *
  * The reference operates on per-chunk numpy arrays; here every tile is a flat
  * `Array[Long]` with an explicit `shape`. A `Box` is the Scala analogue of a
  * tuple of python slices (start inclusive, end exclusive per axis).
  */
object Nd {

  /** Row-major strides for `shape`. */
  def strides(shape: Array[Int]): Array[Int] = {
    val n = shape.length
    val st = new Array[Int](n)
    var acc = 1
    var i = n - 1
    while (i >= 0) { st(i) = acc; acc *= shape(i); i -= 1 }
    st
  }

  def size(shape: Array[Int]): Int = {
    var acc = 1; var i = 0
    while (i < shape.length) { acc *= shape(i); i += 1 }
    acc
  }

  /** A hyper-rectangle: per-axis [start, end). */
  final case class Box(start: Array[Int], end: Array[Int]) {
    def shape: Array[Int] = Array.tabulate(start.length)(a => end(a) - start(a))
    def numel: Int = Nd.size(shape)
  }

  /** Visit every flat index of `box` within an array of shape `shape`,
    * in row-major order. `f` receives the flat index.
    */
  def foreachIndex(shape: Array[Int], box: Box)(f: Int => Unit): Unit = {
    val dims = shape.length
    val st = strides(shape)
    val bs = box.shape
    val total = size(bs)
    if (total == 0) return
    // odometer over box coords
    val cur = box.start.clone()
    var base = 0
    var a = 0
    while (a < dims) { base += cur(a) * st(a); a += 1 }
    var count = 0
    while (count < total) {
      f(base)
      count += 1
      // increment odometer from the last axis
      var ax = dims - 1
      var carry = true
      while (carry && ax >= 0) {
        cur(ax) += 1
        base += st(ax)
        if (cur(ax) >= box.end(ax)) {
          base -= (cur(ax) - box.start(ax)) * st(ax)
          cur(ax) = box.start(ax)
          ax -= 1
        } else carry = false
      }
    }
  }

  /** Extract the contents of `box` from `src` (shape `srcShape`) into a new
    * row-major flat array.
    */
  def sliceBox(src: Array[Long], srcShape: Array[Int], box: Box): Array[Long] = {
    val out = new Array[Long](box.numel)
    var i = 0
    foreachIndex(srcShape, box) { flat => out(i) = src(flat); i += 1 }
    out
  }

  /** Paste `payload` (row-major, shaped as `box.shape`) into `dst` at `box`. */
  def pasteBox(dst: Array[Long], dstShape: Array[Int], box: Box,
               payload: Array[Long]): Unit = {
    var i = 0
    foreachIndex(dstShape, box) { flat => dst(flat) = payload(i); i += 1 }
  }

  /** Paste only non-zero payload values (`np.where(mask, v, dst)` painting). */
  def paintNonZero(dst: Array[Long], dstShape: Array[Int], box: Box,
                   payload: Array[Long]): Unit = {
    var i = 0
    foreachIndex(dstShape, box) { flat =>
      val v = payload(i)
      if (v != 0L) dst(flat) = v
      i += 1
    }
  }

  /** Full-array box. */
  def fullBox(shape: Array[Int]): Box =
    Box(new Array[Int](shape.length), shape.clone())
}
