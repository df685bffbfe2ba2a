package graft.core

import graft.tiles.Tile

/** Per-tile kernels — pure Scala re-expressions of the reference's chunk
  * kernels. These run inside `Dataset.map`/`mapGroups` closures; they touch
  * no Spark API so they are unit-testable against the golden fixtures
  * without a session.
  */
object Kernels {

  /** O3 `remove_overlapped_objects` (`chunkops.py:11-101`).
    *
    * Per tile: classify every label by the fraction `p` of its pixels inside
    * the interior (non-margin) box; `p > 1-threshold` keeps, `p < threshold`
    * drops, and labels in between are owned by the first enumerated overlap
    * region containing them — dropped iff that region's parity is odd
    * (`chunkops.py:49-79`). Survivors get the chunk-disjoint global int64
    * offset (`chunkops.py:93-99`). The classes channel is masked by survival
    * (`relabeling.py:71`).
    *
    * Single pass for the histograms (the reference's per-label `np.where`
    * loops are O(labels*pixels) — its main single-node inefficiency,
    * BASELINE.md).
    */
  def removeOverlapped(tile: Tile, overlaps: Array[Int], threshold: Double): Tile = {
    // Dense fast path: fresh segmentation labels are 1..N per tile, so flat
    // arrays beat boxed hash maps by ~an order of magnitude in the hot
    // histogram pass. Sparse path covers pre-labeled inputs whose ids are
    // already spread over int64 (labels2geojson on global-id tiles).
    var maxL = 0L
    var minL = 0L
    var i = 0
    while (i < tile.data.length) {
      val v = tile.data(i)
      if (v > maxL) maxL = v
      if (v < minL) minL = v
      i += 1
    }
    // negative or huge ids (pre-labeled exotic inputs) -> hash-map path
    if (minL >= 0L && maxL <= (1 << 22)) removeDense(tile, overlaps, threshold, maxL.toInt)
    else removeSparse(tile, overlaps, threshold)
  }

  private def removeDense(tile: Tile, overlaps: Array[Int], threshold: Double,
                          maxL: Int): Tile = {
    val data = tile.data
    val n = data.length
    val shape = tile.shape
    val loc = tile.loc
    val grid = tile.grid
    val dims = tile.dims

    val total = new Array[Int](maxL + 1)
    val intr = new Array[Int](maxL + 1)
    var i = 0
    while (i < n) {
      val v = data(i)
      if (v != 0L) total(v.toInt) += 1
      i += 1
    }
    Nd.foreachIndex(shape, Regions.interiorBox(loc, grid, overlaps, shape)) { flat =>
      val v = data(flat)
      if (v != 0L) intr(v.toInt) += 1
    }

    // codes: +/-(dims+1) firmly in/out (`chunkops.py:49-52`); 0 = band
    val codes = new Array[Int](maxL + 1)
    var l = 1
    while (l <= maxL) {
      if (total(l) > 0) {
        val p = intr(l).toDouble / total(l).toDouble
        codes(l) = if (p > 1.0 - threshold) dims + 1
                   else if (p < threshold) -(dims + 1)
                   else 0
      }
      l += 1
    }

    for (levels <- Regions.validOverlaps(loc, grid)) {
      val drop = Regions.parityDrop(loc, levels)
      val rdim = Regions.regionDim(levels)
      val box = Regions.sourceBox(loc, grid, overlaps, levels, shape)
      Nd.foreachIndex(shape, box) { flat =>
        val v = data(flat)
        if (v != 0L) {
          val li = v.toInt
          if (total(li) > 0 && math.abs(codes(li)) < rdim &&
              intr(li).toDouble / total(li).toDouble >= threshold)
            codes(li) = if (drop) -rdim else rdim
        }
      }
    }

    val offset = Regions.labelOffset(loc, grid)
    val out = new Array[Long](n)
    i = 0
    while (i < n) {
      val v = data(i)
      if (v != 0L && codes(v.toInt) >= 0) out(i) = v + offset
      i += 1
    }
    maskClasses(tile, out)
  }

  /** Overlap-sufficiency diagnostic: labels present on BOTH opposite margin
    * faces of one expanded tile along some axis. That is the signature of an
    * object spanning the tile's whole core plus both halos — wider than the
    * overlap can cover — which the O3 parity rule then SILENTLY splits into
    * two differently-owned fragments. The reference inherits this
    * correctness constraint (objects must fit inside the overlap margin,
    * `chunkops.py:25-89` assumes every object lies fully inside at least one
    * expanded tile) but never detects a violation; this kernel makes the
    * failure observable at any scale, per tile, before merge.
    *
    * A margin face only exists where a neighbor actually shipped a halo
    * (`loc > 0` low side, `loc < grid-1` high side), so edge tiles cannot
    * false-positive. Returns (axis, label) pairs, deduplicated, in
    * deterministic (axis, label) order. One pass over the tile.
    */
  def marginSpanViolations(tile: Tile, overlaps: Array[Int]): Array[(Int, Long)] = {
    val dims = tile.dims
    val shape = tile.shape
    val data = tile.data
    val hasLow = Array.tabulate(dims)(a => tile.loc(a) > 0 && overlaps(a) > 0)
    val hasHigh = Array.tabulate(dims)(a =>
      tile.loc(a) < tile.grid(a) - 1 && overlaps(a) > 0)
    if (!hasLow.exists(identity) && !hasHigh.exists(identity))
      return Array.empty
    val lowSeen = Array.fill(dims)(new java.util.HashSet[Long]())
    val highSeen = Array.fill(dims)(new java.util.HashSet[Long]())
    val strides = new Array[Int](dims)
    if (dims > 0) {
      strides(dims - 1) = 1
      var a = dims - 2
      while (a >= 0) { strides(a) = strides(a + 1) * shape(a + 1); a -= 1 }
    }
    var flat = 0
    while (flat < data.length) {
      val v = data(flat)
      if (v != 0L) {
        var a = 0
        while (a < dims) {
          val idx = (flat / strides(a)) % shape(a)
          if (hasLow(a) && idx < overlaps(a)) lowSeen(a).add(v)
          if (hasHigh(a) && idx >= shape(a) - overlaps(a)) highSeen(a).add(v)
          a += 1
        }
      }
      flat += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var a = 0
    while (a < dims) {
      if (hasLow(a) && hasHigh(a)) {
        val it = lowSeen(a).iterator()
        val hits = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (it.hasNext) { val l = it.next(); if (highSeen(a).contains(l)) hits += l }
        hits.sorted.foreach(l => out += ((a, l)))
      }
      a += 1
    }
    out.toArray
  }

  private def maskClasses(tile: Tile, out: Array[Long]): Tile = {
    val newClasses =
      if (!tile.hasClasses) tile.classes
      else tile.classes.map { ch =>
        val nc = new Array[Long](out.length)
        var j = 0
        while (j < out.length) { if (out(j) != 0L) nc(j) = ch(j); j += 1 }
        nc
      }
    tile.copy(data = out, classes = newClasses)
  }

  private def removeSparse(tile: Tile, overlaps: Array[Int], threshold: Double): Tile = {
    val data = tile.data
    val n = data.length
    val shape = tile.shape
    val loc = tile.loc
    val grid = tile.grid

    // label -> (total pixels, interior pixels)
    val total = new java.util.HashMap[java.lang.Long, Array[Int]]()
    var i = 0
    while (i < n) {
      val v = data(i)
      if (v != 0L) {
        var c = total.get(v)
        if (c == null) { c = new Array[Int](2); total.put(v, c) }
        c(0) += 1
      }
      i += 1
    }
    val interior = Regions.interiorBox(loc, grid, overlaps, shape)
    Nd.foreachIndex(shape, interior) { flat =>
      val v = data(flat)
      if (v != 0L) total.get(v)(1) += 1
    }

    // region-dim codes (`chunkops.py:49-52`): +/-(dims+1) for firmly
    // interior/margin labels; 0 for the in-between band.
    val dims = tile.dims
    val codes = new java.util.HashMap[java.lang.Long, java.lang.Integer]()
    val props = new java.util.HashMap[java.lang.Long, java.lang.Double]()
    val it0 = total.entrySet().iterator()
    while (it0.hasNext) {
      val e = it0.next()
      // float32 division in the reference (`chunkops.py:36-48`); ratios of
      // small integer counts are far from the threshold in either precision.
      val p = e.getValue()(1).toDouble / e.getValue()(0).toDouble
      props.put(e.getKey, p)
      val c = if (p > 1.0 - threshold) dims + 1
              else if (p < threshold) -(dims + 1)
              else 0
      codes.put(e.getKey, c)
    }

    // region scan in exact enumeration order (`chunkops.py:59-79`)
    for (levels <- Regions.validOverlaps(loc, grid)) {
      val drop = Regions.parityDrop(loc, levels)
      val rdim = Regions.regionDim(levels)
      val box = Regions.sourceBox(loc, grid, overlaps, levels, shape)
      val present = new java.util.HashSet[java.lang.Long]()
      Nd.foreachIndex(shape, box) { flat =>
        val v = data(flat)
        if (v != 0L) present.add(v)
      }
      val it = present.iterator()
      while (it.hasNext) {
        val lbl = it.next()
        val p = props.get(lbl)
        val c = codes.get(lbl)
        if (p >= threshold && math.abs(c) < rdim)
          codes.put(lbl, if (drop) -rdim else rdim)
      }
    }

    // drop negatives, offset survivors (`chunkops.py:83-99`)
    val offset = Regions.labelOffset(loc, grid)
    val out = new Array[Long](n)
    i = 0
    while (i < n) {
      val v = data(i)
      if (v != 0L && codes.get(v) >= 0) out(i) = v + offset
      i += 1
    }
    maskClasses(tile, out)
  }

  /** O4 `merge_tiles` paint (`chunkops.py:132-189`), shard-based.
    *
    * Rather than materializing the doubly-expanded array of `da.map_overlap`,
    * each merging region's source pixels arrive as a halo shard (keyed by the
    * region levels from this tile's perspective). In exact merging-region
    * order, non-zero shard labels overwrite the destination box; classes
    * follow the same mask (`chunkops.py:170-181`).
    *
    * `shardFor(levels)` returns the (labels, classes-channels) payload for a
    * region, shaped as the region's dest box.
    */
  def mergePaint(tile: Tile, overlaps: Array[Int],
                 shardFor: Array[Int] => (Array[Long], Array[Array[Long]])): Tile = {
    val shape = tile.shape
    val out = tile.data.clone()
    val outClasses = if (tile.hasClasses) tile.classes.map(_.clone()) else tile.classes

    for (levels <- Regions.mergingOverlaps(tile.loc, tile.grid)) {
      val dst = Regions.destBox(tile.loc, tile.grid, overlaps, levels, shape)
      val (shard, shardClasses) = shardFor(levels)
      require(shard.length == dst.numel,
        s"shard size ${shard.length} != dest box ${dst.numel} for region ${levels.mkString(",")} of tile ${tile.loc.mkString(",")}")
      var i = 0
      Nd.foreachIndex(shape, dst) { flat =>
        val v = shard(i)
        if (v != 0L) {
          out(flat) = v
          if (outClasses.nonEmpty) {
            var ch = 0
            while (ch < outClasses.length) {
              outClasses(ch)(flat) = shardClasses(ch)(i)
              ch += 1
            }
          }
        }
        i += 1
      }
    }
    tile.copy(data = out, classes = outClasses)
  }

  /** Trim halos: keep only the interior box (`da.overlap.trim_overlap`,
    * `relabeling.py:97`). After this, every tile is core (chunk) sized.
    */
  def trimOverlap(tile: Tile, overlaps: Array[Int]): Tile = {
    val box = Regions.interiorBox(tile.loc, tile.grid, overlaps, tile.shape)
    val data = Nd.sliceBox(tile.data, tile.shape, box)
    val classes =
      if (tile.hasClasses) tile.classes.map(ch => Nd.sliceBox(ch, tile.shape, box))
      else tile.classes
    tile.copy(shape = box.shape, data = data, classes = classes)
  }

  /** O10 `sort_indices` (`chunkops.py:104-113`): remap every label to its
    * index in the globally sorted distinct-label list (broadcast).
    */
  def sortRemap(tile: Tile, rank: java.util.HashMap[java.lang.Long, java.lang.Long]): Tile = {
    val out = new Array[Long](tile.data.length)
    var i = 0
    while (i < out.length) {
      val r = rank.get(tile.data(i))
      // fail loudly instead of an opaque unboxing NPE: a miss means the tiles
      // lineage recomputed differently between the distinct pass and this one
      if (r == null) throw new IllegalStateException(
        s"label ${tile.data(i)} has no rank: non-deterministic input " +
          "lineage? persist the tiles Dataset before sorting")
      out(i) = r
      i += 1
    }
    tile.copy(data = out)
  }

  /** Zero-pad a tile on the high side to `target` shape
    * (`relabeling.py:175-178` — pad is high-side only).
    */
  def padTo(tile: Tile, target: Array[Int]): Tile = {
    if (java.util.Arrays.equals(tile.shape, target)) return tile
    val out = new Array[Long](Nd.size(target))
    Nd.pasteBox(out, target, Nd.Box(new Array[Int](tile.dims), tile.shape.clone()), tile.data)
    val classes =
      if (tile.hasClasses) tile.classes.map { ch =>
        val o = new Array[Long](Nd.size(target))
        Nd.pasteBox(o, target, Nd.Box(new Array[Int](tile.dims), tile.shape.clone()), ch)
        o
      } else tile.classes
    tile.copy(shape = target, data = out, classes = classes)
  }

  /** Crop a tile to `target` shape from the origin (the `image2labels` final
    * un-pad slice, `relabeling.py:237-240`).
    */
  def cropTo(tile: Tile, target: Array[Int]): Tile = {
    if (java.util.Arrays.equals(tile.shape, target)) return tile
    val box = Nd.Box(new Array[Int](tile.dims), target.clone())
    val classes =
      if (tile.hasClasses) tile.classes.map(ch => Nd.sliceBox(ch, tile.shape, box))
      else tile.classes
    tile.copy(shape = target, data = Nd.sliceBox(tile.data, tile.shape, box),
      classes = classes)
  }
}
