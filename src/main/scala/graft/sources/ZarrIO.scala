package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, DeflaterOutputStream, GZIPInputStream, GZIPOutputStream, InflaterInputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.tiles.{GridSpec, Tile}

/** Zarr v2 chunk-store source/sink for tile tables.
  *
  * The reference suggests zarr for pipeline intermediates
  * (`relabeling.py:319-322` docstring); this implements the published zarr
  * v2 on-disk layout directly — a `.zarray` JSON descriptor next to one
  * file per chunk named by its grid indices — with no third-party
  * dependency (JSON via the Jackson shipped inside Spark, compression via
  * `java.util.zip`).
  *
  * Scale notes: the store is listed on the driver (names only — O(chunks)
  * strings, no data), and chunk payloads are read/written entirely on
  * executors, one file per task batch. [[readBox]] prunes the chunk list
  * to a coordinate box BEFORE any file is opened — the zarr analog of
  * parquet partition pruning, and the access pattern that matters when the
  * store is 100 TB on object storage and the query wants one region. All
  * byte I/O goes through [[StoreIO]] (Hadoop `FileSystem`), so that object
  * store can actually be addressed: `s3a://bucket/store` works wherever a
  * local path does.
  *
  * Supported dtypes: `|u1`, `<u2`, `<i4`, `<i8` (the reference's uint8/16
  * inputs and int32/64 label spaces, SURVEY.md §1.2). Compressors: zarr's
  * `zlib` and `gzip` codecs or none (`blosc` needs a native library that a
  * plain JVM cluster cannot assume). Chunks are stored full-size in C
  * order, edge chunks padded with `fill_value` — both per the v2 spec.
  */
// Serializable: stateless codec object; executor closures reference its
// lifted local helpers (buildTile), which captures the singleton itself.
object ZarrIO extends Serializable {

  final case class Meta(
      shape: Array[Long],
      chunks: Array[Int],
      dtype: String,
      compressor: String, // "zlib" | "gzip" | "" (= null/raw)
      fillValue: Long,
      separator: String) {
    def dims: Int = shape.length
    def spec: GridSpec = GridSpec(shape, chunks)
  }

  private val WIDTHS = Map("|u1" -> 1, "<u2" -> 2, "<i4" -> 4, "<i8" -> 8)

  // ------------------------------------------------------------- metadata

  def readMeta(dir: String): Meta = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(StoreIO.readAllBytes(StoreIO.hadoopConf,
      new Path(dir, ".zarray").toString))
    require(root.path("zarr_format").asInt() == 2,
      s"unsupported zarr_format ${root.path("zarr_format")}")
    require(root.path("order").asText("C") == "C", "only C-order zarr supported")
    require(root.path("filters").isNull || root.path("filters").isMissingNode,
      "zarr filters not supported")
    val shape = {
      val n = root.path("shape")
      Array.tabulate(n.size())(i => n.get(i).asLong())
    }
    val chunks = {
      val n = root.path("chunks")
      Array.tabulate(n.size())(i => n.get(i).asInt())
    }
    val dtype = root.path("dtype").asText()
    require(WIDTHS.contains(dtype), s"unsupported zarr dtype $dtype")
    val comp = root.path("compressor")
    val compressor =
      if (comp.isNull || comp.isMissingNode) ""
      else comp.path("id").asText() match {
        case c @ ("zlib" | "gzip") => c
        case c => throw new IllegalArgumentException(s"unsupported compressor $c")
      }
    val fill = if (root.path("fill_value").isNull) 0L else root.path("fill_value").asLong()
    Meta(shape, chunks, dtype, compressor,
      fill, root.path("dimension_separator").asText("."))
  }

  private[sources] def writeMeta(dir: String, meta: Meta): Unit = {
    val comp =
      if (meta.compressor.isEmpty) "null"
      else if (meta.compressor == "zlib") """{"id": "zlib", "level": 1}"""
      else s"""{"id": "${meta.compressor}"}"""
    val json =
      s"""{
         |  "zarr_format": 2,
         |  "shape": [${meta.shape.mkString(", ")}],
         |  "chunks": [${meta.chunks.mkString(", ")}],
         |  "dtype": "${meta.dtype}",
         |  "compressor": $comp,
         |  "fill_value": ${meta.fillValue},
         |  "order": "C",
         |  "filters": null,
         |  "dimension_separator": "${meta.separator}"
         |}""".stripMargin
    StoreIO.write(StoreIO.hadoopConf, new Path(dir, ".zarray").toString,
      json.getBytes(StandardCharsets.UTF_8))
  }

  // ---------------------------------------------------------- chunk codec

  /** Decode one stored chunk (full chunk-size, C order) into the exact-extent
    * tile payload for chunk `loc` — edge padding is dropped here, so the
    * Tile rows match what [[graft.sources.TileIO.fromPixels]] builds.
    */
  private[sources] def decodeChunk(raw: Array[Byte], meta: Meta,
      loc: Array[Int], tileShape: Array[Int]): Array[Long] = {
    val bytes = meta.compressor match {
      case ""     => raw
      case "zlib" => drain(new InflaterInputStream(new java.io.ByteArrayInputStream(raw)))
      case "gzip" => drain(new GZIPInputStream(new java.io.ByteArrayInputStream(raw)))
    }
    val w = WIDTHS(meta.dtype)
    require(bytes.length == meta.chunks.product.toLong * w,
      s"chunk ${loc.mkString(",")}: ${bytes.length} bytes, " +
        s"expected ${meta.chunks.product.toLong * w}")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Long](tileShape.product)
    val chunkStrides = graft.core.Nd.strides(meta.chunks)
    val idx = new Array[Int](meta.dims)
    val dims = meta.dims
    // hoist the dtype dispatch out of the pixel loop: one reader function
    // per chunk, not a string match per element
    val reader: Int => Long = meta.dtype match {
      case "|u1" => src => bb.get(src) & 0xffL
      case "<u2" => src => bb.getShort(src * 2) & 0xffffL
      case "<i4" => src => bb.getInt(src * 4).toLong
      case "<i8" => src => bb.getLong(src * 8)
    }
    var flat = 0
    while (flat < out.length) {
      var src = 0
      var a = 0
      while (a < dims) { src += idx(a) * chunkStrides(a); a += 1 }
      out(flat) = reader(src)
      flat += 1
      var b = dims - 1
      while (b >= 0 && { idx(b) += 1; idx(b) == tileShape(b) }) { idx(b) = 0; b -= 1 }
    }
    out
  }

  /** Encode one tile payload as a full-size stored chunk (fill-padded). */
  private[sources] def encodeChunk(data: Array[Long], meta: Meta,
      tileShape: Array[Int]): Array[Byte] = {
    val w = WIDTHS(meta.dtype)
    val chunkElems = meta.chunks.product
    val bytes = new Array[Byte](chunkElems * w)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // hoisted writer: range check + dispatch resolved once per chunk
    val writer: (Int, Long) => Unit = meta.dtype match {
      case "|u1" => (i, v) => {
        require(v >= 0 && v <= 0xffL, s"value $v out of |u1 range")
        bb.put(i, v.toByte)
      }
      case "<u2" => (i, v) => {
        require(v >= 0 && v <= 0xffffL, s"value $v out of <u2 range")
        bb.putShort(i * 2, v.toShort)
      }
      case "<i4" => (i, v) => {
        require(v >= Int.MinValue && v <= Int.MaxValue, s"value $v out of <i4 range")
        bb.putInt(i * 4, v.toInt)
      }
      case "<i8" => (i, v) => bb.putLong(i * 8, v)
    }
    if (meta.fillValue != 0L) {
      var i = 0
      while (i < chunkElems) { writer(i, meta.fillValue); i += 1 }
    }
    val chunkStrides = graft.core.Nd.strides(meta.chunks)
    val idx = new Array[Int](meta.dims)
    val dims = meta.dims
    var flat = 0
    while (flat < data.length) {
      var dst = 0
      var a = 0
      while (a < dims) { dst += idx(a) * chunkStrides(a); a += 1 }
      writer(dst, data(flat))
      flat += 1
      var b = dims - 1
      while (b >= 0 && { idx(b) += 1; idx(b) == tileShape(b) }) { idx(b) = 0; b -= 1 }
    }
    meta.compressor match {
      case "" => bytes
      case "zlib" =>
        val bos = new ByteArrayOutputStream()
        val dos = new DeflaterOutputStream(bos, new Deflater(1))
        dos.write(bytes); dos.close(); bos.toByteArray
      case "gzip" =>
        val bos = new ByteArrayOutputStream()
        // level 1 to match what the v3 zarr.json declares for its gzip
        // codec (GZIPOutputStream would otherwise silently use level 6);
        // `def` is DeflaterOutputStream's protected Deflater field
        val gos = new GZIPOutputStream(bos) { `def`.setLevel(Deflater.BEST_SPEED) }
        gos.write(bytes); gos.close(); bos.toByteArray
    }
  }

  private def drain(in: java.io.InputStream): Array[Byte] =
    try {
      val bos = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } finally in.close()

  // ------------------------------------------------------------ read path

  /** Read the whole store as a tile table. */
  def read(spark: SparkSession, dir: String): Dataset[Tile] =
    readPruned(spark, dir, _ => true)

  /** Sparse read: only the chunks that exist as objects — no fill-tile
    * synthesis for absent grid cells. For a mostly-empty store this keeps
    * the driver work AND the job size O(present chunks) instead of
    * O(nominal grid); use it when downstream logic treats absence as
    * absence (e.g. compaction, GC, re-sharding) rather than as the dense
    * fill_value frame a pipeline read expects.
    */
  def readPresent(spark: SparkSession, dir: String): Dataset[Tile] =
    readPruned(spark, dir, _ => true, includeFill = false)

  /** Read only the chunks whose grid coordinates fall in `[lo, hi]`
    * (inclusive) — chunk-level pruning before any payload I/O.
    */
  def readBox(spark: SparkSession, dir: String,
      lo: Array[Int], hi: Array[Int]): Dataset[Tile] =
    readPruned(spark, dir,
      loc => loc.indices.forall(a => loc(a) >= lo(a) && loc(a) <= hi(a)))

  private def readPruned(spark: SparkSession, dir: String,
      keep: Array[Int] => Boolean, includeFill: Boolean = true): Dataset[Tile] = {
    import spark.implicits._
    val meta = readMeta(dir)
    val grid = meta.spec.gridShape
    // driver sees names only; the separator "/" layout nests directories.
    // Zarr semantics: a chunk OBJECT that does not exist still READS as
    // fill_value — the dense tile dataset is the dask-array frame the
    // reference pipelines over (cf. relabeling.py reading any zarr region).
    // Driver-side cost is O(present chunks) in BOTH modes: the dense path
    // never materializes the nominal grid — executors decode their own
    // row-major index range and check presence in a broadcast set.
    val present = listChunkLocs(dir, meta).map(_.mkString(",")).toSet
    val dims = meta.dims
    val sep = meta.separator
    val shape = meta.shape
    val chunks = meta.chunks
    val fill = meta.fillValue
    val sconf = StoreIO.ser(StoreIO.hadoopConf)
    val par = spark.sparkContext.defaultParallelism

    def buildTile(loc: Array[Int], isPresent: Boolean): Tile = {
      val tileShape = Array.tabulate(dims) { a =>
        math.min(chunks(a).toLong, shape(a) - loc(a).toLong * chunks(a)).toInt
      }
      if (!isPresent)
        Tile(loc, grid.clone(), tileShape,
          Array.fill(tileShape.product)(fill))
      else {
        val raw = StoreIO.readAllBytes(sconf.value,
          new Path(dir, loc.mkString(sep)).toString)
        Tile(loc, grid.clone(), tileShape,
          decodeChunk(raw, meta, loc, tileShape))
      }
    }

    if (!includeFill) {
      // O(present) end to end: parallelize the listing itself.
      val locs = present.toSeq.sorted
        .map(_.split(',').map(_.toInt)).filter(keep).map(_.toSeq)
      spark.createDataset(locs)
        .repartition(math.max(1, math.min(locs.size, par)))
        .map(l => buildTile(l.toArray, isPresent = true))
    } else {
      val total = grid.foldLeft(1L)(_ * _)
      val presentB = spark.sparkContext.broadcast(present)
      spark.range(0L, total, 1L, math.max(1L, math.min(total, par.toLong)).toInt)
        .flatMap { i =>
          val loc = locOfIndex(i, grid)
          if (!keep(loc)) None
          else Some(buildTile(loc, presentB.value.contains(loc.mkString(","))))
        }
    }
  }

  /** Row-major decode of a flat grid index into grid coordinates. */
  private[sources] def locOfIndex(i: Long, grid: Array[Int]): Array[Int] = {
    val loc = new Array[Int](grid.length)
    var rem = i
    var a = grid.length - 1
    while (a >= 0) { loc(a) = (rem % grid(a)).toInt; rem /= grid(a); a -= 1 }
    loc
  }

  /** All grid locations in row-major order (driver-side helper; read paths
    * use [[locOfIndex]] on executors so the nominal grid is never a
    * driver-memory structure).
    */
  private[sources] def enumerateGrid(grid: Array[Int]): Seq[Array[Int]] = {
    val total = grid.foldLeft(1L)(_ * _)
    (0L until total).map(locOfIndex(_, grid))
  }

  private[sources] def listChunkLocs(dir: String, meta: Meta): Seq[Array[Int]] = {
    val conf = StoreIO.hadoopConf
    val grid = meta.spec.gridShape
    def valid(loc: Array[Int]): Boolean =
      loc.length == meta.dims && loc.indices.forall(a => loc(a) >= 0 && loc(a) < grid(a))
    if (meta.separator == "/") {
      def walk(path: String, isFile: Boolean, depth: Int,
          prefix: List[Int]): Seq[Array[Int]] =
        if (depth == meta.dims) {
          val loc = prefix.reverse.toArray
          if (isFile && valid(loc)) Seq(loc) else Seq.empty
        } else if (!isFile) {
          StoreIO.list(conf, path).flatMap { c =>
            c.getPath.getName.toIntOption match {
              case Some(i) => walk(c.getPath.toString, c.isFile, depth + 1, i :: prefix)
              case None    => Seq.empty
            }
          }
        } else Seq.empty
      walk(dir, isFile = false, 0, Nil)
    } else {
      StoreIO.list(conf, dir)
        .filter(f => f.isFile && !f.getPath.getName.startsWith("."))
        .flatMap { f =>
          val parts = f.getPath.getName
            .split(java.util.regex.Pattern.quote(meta.separator))
          val loc = parts.flatMap(_.toIntOption)
          if (loc.length == parts.length && valid(loc)) Seq(loc) else Seq.empty
        }
    }
  }

  // ----------------------------------------------------------- write path

  /** Write a tile table as a zarr store. Executors write their own chunk
    * files (the driver only writes the 200-byte `.zarray`), so the sink
    * scales with the cluster exactly like the geojson sink — no tile
    * payload ever moves to the driver.
    */
  def write(tiles: Dataset[Tile], spec: GridSpec, dir: String,
      dtype: String = "<i8", compressor: String = "zlib",
      fillValue: Long = 0L): Unit = {
    val meta = Meta(spec.imageShape.clone(), spec.chunk.clone(), dtype,
      compressor, fillValue, ".")
    val conf = StoreIO.hadoopConf
    StoreIO.mkdirs(conf, dir)
    writeMeta(dir, meta)
    val sconf = StoreIO.ser(conf)
    tiles.foreachPartition { (it: Iterator[Tile]) =>
      it.foreach { t =>
        val bytes = encodeChunk(t.data, meta, t.shape)
        StoreIO.write(sconf.value,
          new Path(dir, t.loc.mkString(meta.separator)).toString, bytes)
      }
    }
  }
}
