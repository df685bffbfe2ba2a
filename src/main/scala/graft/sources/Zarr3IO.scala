package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.tiles.{GridSpec, Tile}

/** Zarr v3 store source/sink, alongside the v2 implementation in
  * [[ZarrIO]] — the published v3 core layout: a `zarr.json` descriptor
  * (`zarr_format: 3`, `node_type: "array"`, regular chunk grid, default
  * chunk-key encoding) and chunk files under the `c` prefix
  * (`c/1/2` with the default `/` separator). The wire format of a chunk is
  * the v3 codec chain: `bytes` (little-endian) optionally followed by
  * `gzip` — structurally the same full-size C-order fill-padded buffer as
  * v2, so the element codec is shared with [[ZarrIO]] via an internal
  * dtype mapping.
  *
  * Same scale posture as v2: the driver lists chunk KEYS only; payloads are
  * read and written on executors; [[readBox]]-style pruning composes via
  * [[read]]'s predicate overload.
  */
object Zarr3IO {

  /** v3 data_type -> v2 dtype string understood by the shared chunk codec. */
  private val DTYPES = Map(
    "uint8" -> "|u1", "uint16" -> "<u2", "int32" -> "<i4", "int64" -> "<i8")

  /** Reverse mapping for layout inheritance in the DSv2 write path. */
  private[sources] def v3NameOf(v2dtype: String): String =
    DTYPES.collectFirst { case (n, d) if d == v2dtype => n }.getOrElse(
      throw new IllegalArgumentException(
        s"v2 dtype $v2dtype has no zarr v3 data_type equivalent"))

  private[sources] def isV3Name(n: String): Boolean = DTYPES.contains(n)

  final case class Meta3(
      shape: Array[Long],
      chunks: Array[Int],
      dataType: String,  // v3 name, e.g. "uint16"
      gzip: Boolean,
      fillValue: Long,
      separator: String) {
    def dims: Int = shape.length
    def spec: GridSpec = GridSpec(shape, chunks)
    /** The equivalent v2 meta driving the shared element codec. */
    private[sources] def v2: ZarrIO.Meta =
      ZarrIO.Meta(shape, chunks, DTYPES(dataType),
        if (gzip) "gzip" else "", fillValue, separator)
  }

  // ------------------------------------------------------------- metadata

  def readMeta(dir: String): Meta3 = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(StoreIO.readAllBytes(StoreIO.hadoopConf,
      new Path(dir, "zarr.json").toString))
    require(root.path("zarr_format").asInt() == 3,
      s"unsupported zarr_format ${root.path("zarr_format")}")
    require(root.path("node_type").asText() == "array",
      s"expected an array node, got ${root.path("node_type")}")
    val shape = {
      val n = root.path("shape")
      Array.tabulate(n.size())(i => n.get(i).asLong())
    }
    val grid = root.path("chunk_grid")
    require(grid.path("name").asText() == "regular",
      s"unsupported chunk grid ${grid.path("name")}")
    val cs = grid.path("configuration").path("chunk_shape")
    val chunks = Array.tabulate(cs.size())(i => cs.get(i).asInt())
    val dataType = root.path("data_type").asText()
    require(DTYPES.contains(dataType), s"unsupported v3 data_type $dataType")
    val cke = root.path("chunk_key_encoding")
    require(cke.isMissingNode || cke.path("name").asText("default") == "default",
      s"unsupported chunk_key_encoding ${cke.path("name")}")
    val sep = cke.path("configuration").path("separator").asText("/")
    // codec chain: exactly `bytes` (little endian), optionally + `gzip`
    val codecs = root.path("codecs")
    val names = (0 until codecs.size()).map(i => codecs.get(i).path("name").asText())
    require(names.headOption.contains("bytes"),
      s"codec chain must start with 'bytes', got $names")
    val endian = codecs.get(0).path("configuration").path("endian").asText("little")
    require(endian == "little", s"unsupported endian $endian")
    require(names.drop(1).forall(_ == "gzip"),
      s"unsupported codecs beyond bytes(+gzip): $names")
    val fill = if (root.path("fill_value").isNull) 0L
               else root.path("fill_value").asLong()
    Meta3(shape, chunks, dataType, names.contains("gzip"), fill, sep)
  }

  private[sources] def writeMeta(dir: String, meta: Meta3): Unit = {
    val codecs =
      if (meta.gzip)
        """[{"name": "bytes", "configuration": {"endian": "little"}},
          |    {"name": "gzip", "configuration": {"level": 1}}]""".stripMargin
      else """[{"name": "bytes", "configuration": {"endian": "little"}}]"""
    val json =
      s"""{
         |  "zarr_format": 3,
         |  "node_type": "array",
         |  "shape": [${meta.shape.mkString(", ")}],
         |  "data_type": "${meta.dataType}",
         |  "chunk_grid": {
         |    "name": "regular",
         |    "configuration": {"chunk_shape": [${meta.chunks.mkString(", ")}]}
         |  },
         |  "chunk_key_encoding": {
         |    "name": "default",
         |    "configuration": {"separator": "${meta.separator}"}
         |  },
         |  "fill_value": ${meta.fillValue},
         |  "codecs": $codecs
         |}""".stripMargin
    StoreIO.write(StoreIO.hadoopConf, new Path(dir, "zarr.json").toString,
      json.getBytes(StandardCharsets.UTF_8))
  }

  /** Default chunk-key encoding: "c" <sep> i0 <sep> i1 ... */
  private[sources] def chunkKey(loc: Array[Int], sep: String): String =
    ("c" +: loc.map(_.toString)).mkString(sep)

  // ------------------------------------------------------------ read path

  def read(spark: SparkSession, dir: String): Dataset[Tile] =
    read(spark, dir, _ => true)

  /** Read chunks whose grid coordinates satisfy `keep` — pruning happens on
    * the driver's key listing, before any payload file is opened.
    */
  def read(spark: SparkSession, dir: String,
           keep: Array[Int] => Boolean): Dataset[Tile] = {
    import spark.implicits._
    val meta = readMeta(dir)
    val v2 = meta.v2
    val grid = meta.spec.gridShape
    val locs = listChunkLocs(dir, meta).filter(keep)
    val dims = meta.dims
    val sep = meta.separator
    val shape = meta.shape
    val chunks = meta.chunks
    val sconf = StoreIO.ser(StoreIO.hadoopConf)
    spark.createDataset(locs.map(_.toSeq))
      .repartition(math.max(1, math.min(locs.size,
        spark.sparkContext.defaultParallelism)))
      .map { locSeq =>
        val loc = locSeq.toArray
        val tileShape = Array.tabulate(dims) { a =>
          math.min(chunks(a).toLong, shape(a) - loc(a).toLong * chunks(a)).toInt
        }
        val raw = StoreIO.readAllBytes(sconf.value,
          new Path(dir, chunkKey(loc, sep)).toString)
        Tile(loc, grid.clone(), tileShape,
          ZarrIO.decodeChunk(raw, v2, loc, tileShape))
      }
  }

  private[sources] def listChunkLocs(dir: String, meta: Meta3): Seq[Array[Int]] = {
    val conf = StoreIO.hadoopConf
    val grid = meta.spec.gridShape
    def valid(loc: Array[Int]): Boolean =
      loc.length == meta.dims &&
        loc.indices.forall(a => loc(a) >= 0 && loc(a) < grid(a))
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
      walk(new Path(dir, "c").toString, isFile = false, 0, Nil)
    } else {
      StoreIO.list(conf, dir)
        .filter(f => f.isFile && f.getPath.getName.startsWith("c" + meta.separator))
        .flatMap { f =>
          val parts = f.getPath.getName
            .split(java.util.regex.Pattern.quote(meta.separator)).drop(1)
          val loc = parts.flatMap(_.toIntOption)
          if (loc.length == parts.length && loc.length == meta.dims && valid(loc))
            Seq(loc)
          else Seq.empty
        }
    }
  }

  // ----------------------------------------------------------- write path

  /** Write a tile table as a zarr v3 store; executors write their own chunk
    * files, the driver only the `zarr.json`.
    */
  def write(tiles: Dataset[Tile], spec: GridSpec, dir: String,
            dataType: String = "int64", gzip: Boolean = true,
            fillValue: Long = 0L): Unit = {
    require(DTYPES.contains(dataType), s"unsupported v3 data_type $dataType")
    val meta = Meta3(spec.imageShape.clone(), spec.chunk.clone(), dataType,
      gzip, fillValue, "/")
    val v2 = meta.v2
    val conf = StoreIO.hadoopConf
    StoreIO.mkdirs(conf, dir)
    writeMeta(dir, meta)
    val sep = meta.separator
    val sconf = StoreIO.ser(conf)
    tiles.foreachPartition { (it: Iterator[Tile]) =>
      it.foreach { t =>
        val bytes = ZarrIO.encodeChunk(t.data, v2, t.shape)
        StoreIO.write(sconf.value,
          new Path(dir, chunkKey(t.loc, sep)).toString, bytes)
      }
    }
  }
}
