package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Relabel
import graft.tiles.Tile
import Q.tbl

/** Bridges between the tile-form engine and the relational harness.
  *
  * `px_pipeline` is the flagship: it runs the REAL tile engine — Dataset[Tile]
  * kernels with the halo-exchange shuffle — over the synthetic grid of
  * [[RelabelRel]] and is checked against the same DuckDB SQL oracle as the
  * relational formulation. The tile engine itself is thereby DuckDB-verified,
  * not just its relational twin.
  */
object PipelineOps {

  import RelabelRel.{GY, GX, L, OV, THRESHOLD}

  /** Synthetic pixel table -> Dataset[Tile] (one groupByKey; the same shape
    * a parquet tile source would produce).
    */
  private def tilesFromPixels(s: SparkSession, d: String) = {
    import s.implicits._
    RelabelRel.pixelsRaw(s, d)
      .select("gy", "gx", "py", "px", "label")
      .as[(Long, Long, Long, Long, Long)]
      .groupByKey { case (gy, gx, _, _, _) => gy * GX + gx }
      .mapGroups { (_, it) =>
        val rows = it.toArray
        val (gy, gx) = (rows.head._1.toInt, rows.head._2.toInt)
        val data = new Array[Long](L * L)
        rows.foreach { case (_, _, py, px, label) =>
          data(py.toInt * L + px.toInt) = label
        }
        Tile(Array(gy, gx), Array(GY, GX), Array(L, L), data)
      }
  }

  /** Merged tiles -> labeled pixels in the original per-tile frame (trim
    * offset re-added). Shared by every pipeline variant so the trim rule
    * cannot diverge between ingest paths.
    */
  private def explodeMerged(merged: org.apache.spark.sql.Dataset[Tile]): DataFrame = {
    val s = merged.sparkSession
    import s.implicits._
    merged.flatMap { t =>
      val y0 = if (t.loc(0) > 0) OV else 0
      val x0 = if (t.loc(1) > 0) OV else 0
      val (h, w) = (t.shape(0), t.shape(1))
      for {
        y <- 0 until h
        x <- 0 until w
        v = t.data(y * w + x)
        if v != 0L
      } yield (t.loc(0).toLong, t.loc(1).toLong,
        (y + y0).toLong, (x + x0).toLong, v)
    }.toDF("gy", "gx", "py", "px", "gid")
  }

  /** Tile-engine remove+merge, exploded back to labeled pixels. */
  def pipeline(s: SparkSession, d: String): DataFrame = {
    val tiles = tilesFromPixels(s, d)
    val removed = Relabel.removeOverlappedLabels(tiles, Array(OV, OV), THRESHOLD)
    explodeMerged(Relabel.mergeOverlappedTiles(removed, Array(OV, OV)))
  }

  /** px_pipeline with a zarr store in the middle: the synthetic image is
    * written to a zarr v2 store (executor-side chunk files, zlib), read
    * back through [[graft.sources.ZarrIO]], and only then run through
    * remove+merge. Hash-matching the same MERGE_SQL oracle as px_pipeline
    * proves the source end-to-end — layout, dtype codec, edge-chunk
    * padding — not just roundtrip self-consistency.
    */
  /** One store per JVM, overwritten each invocation (same grid at every SF)
    * and removed on exit — repeated Verify/Bench runs must not accumulate
    * image copies in /tmp.
    */
  private lazy val zarrDir: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_zarr")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(p.toFile)
    }))
    p.toString
  }

  def zarrPipeline(s: SparkSession, d: String): DataFrame = {
    val spec = graft.tiles.GridSpec(Array(GY.toLong * L, GX.toLong * L), Array(L, L))
    // labels fit <u2 (max 16): exercise the narrow-dtype path, not just i8
    graft.sources.ZarrIO.write(tilesFromPixels(s, d), spec, zarrDir, "<u2", "zlib")
    val tiles = graft.sources.ZarrIO.read(s, zarrDir)
    val removed = Relabel.removeOverlappedLabels(tiles, Array(OV, OV), THRESHOLD)
    explodeMerged(Relabel.mergeOverlappedTiles(removed, Array(OV, OV)))
  }

  /** Tile-engine remove only, exploded (oracle: relational remove join). */
  def removePixels(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Relabel.removeOverlappedLabels(tilesFromPixels(s, d), Array(OV, OV), THRESHOLD)
      .flatMap { t =>
        val w = t.shape(1)
        for {
          y <- 0 until t.shape(0)
          x <- 0 until w
          v = t.data(y * w + x)
          if v != 0L
        } yield (t.loc(0).toLong, t.loc(1).toLong, y.toLong, x.toLong, v)
      }.toDF("gy", "gx", "py", "px", "gid")
  }

  private val REMOVE_PIXELS_SQL: String =
    RelabelRel.PIXELS_SQL + RelabelRel.REMOVE_CTES + s"""
    SELECT l.gy, l.gx, l.py, l.px, r.gid
    FROM lab l JOIN removed r
      ON l.gy = r.gy AND l.gx = r.gx AND l.label = r.label"""

  /** Flagship for the driver's smoke check. */
  def flagship(s: SparkSession, d: String): DataFrame = pipeline(s, d)

  /** Structured Streaming twin of q14: tumbling 5-minute windows over the
    * events stream, complete-mode memory sink, batch-SQL oracle.
    */
  private val sinkCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  def tumblingStream(s: SparkSession, d: String): DataFrame = {
    val schema = s.read.parquet(s"$d/events.parquet").schema
    // unique per invocation: a second run in the same session must not
    // collide with the previous memory sink's query name
    val qn = "st_tumbling_sink_" + sinkCounter.incrementAndGet()
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
      .withColumn("bucket", expr("ts div 300000000000"))
      .groupBy("bucket", "event_type")
      .agg(count(lit(1)).as("n"),
        // exact decimal sum, final DOUBLE: identical float64 on both engines
        // (a DECIMAL output renders differently across the driver's readers)
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("sum_value"))
    val query = stream.writeStream.outputMode("complete")
      .format("memory").queryName(qn).start()
    try query.processAllAvailable()
    finally query.stop()
    s.table(qn)
  }

  /** Multimodal stub: opaque binary payloads with typed metadata extracted
    * per partition. The decode itself is a clearly-marked deterministic fake
    * (this container has no image codecs) but the Spark plumbing — binary
    * column, mapPartitions batching, typed output schema — is real.
    * Rows-only check (no SQL form).
    */
  def decodeMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    tbl(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // STUB decode: stands in for an image codec; deterministic fake
          val fakeW = 64 + (if (bytes.nonEmpty) bytes(0) & 0x3f else 0)
          val fakeH = 64 + (if (bytes.length > 1) bytes(1) & 0x3f else 0)
          var checksum = 0L
          var i = 0
          while (i < bytes.length) { checksum = checksum * 31 + (bytes(i) & 0xff); i += 1 }
          (id, bytes.length.toLong, fakeW, fakeH, checksum)
        }
      }
      .toDF("doc_id", "n_bytes", "width", "height", "checksum")
  }

  /** O5 through the real annotate kernel over the synthetic removed tiles
    * (rows-only: contour JSON has no SQL form).
    */
  def annotateTiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val removed = Relabel.removeOverlappedLabels(tilesFromPixels(s, d),
      Array(OV, OV), THRESHOLD)
    graft.geojson.Annotate.annotateLabeledTiles(removed, Array(OV, OV))
      .filter(_.geojson != null)
      .toDF("loc_key", "geojson")
  }

  /** Multimodal frame sampling: treat each payload as an opaque "video"
    * (the binary column), cut fixed-size frame windows, keep every k-th
    * frame, and emit typed per-frame metadata. Decode remains a
    * deterministic stub (no codecs in this container); the schema,
    * partition batching, and per-frame explode are the real plumbing.
    * Rows-only check.
    */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val frameBytes = 64
    val stride = 4
    tbl(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val nFrames = bytes.length / frameBytes
          (0 until nFrames by stride).map { f =>
            val off = f * frameBytes
            var checksum = 0L
            var i = off
            while (i < off + frameBytes) { checksum = checksum * 31 + (bytes(i) & 0xff); i += 1 }
            (id, f.toLong, checksum, (bytes(off) & 0xff).toLong)
          }
        }
      }
      .toDF("doc_id", "frame_idx", "frame_checksum", "first_byte")
  }

  /** Multimodal resize stub: byte-stride downsampling standing in for an
    * image resize kernel; output is again an opaque binary + dimensions.
    */
  def resize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    tbl(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val factor = 4
          val out = new Array[Byte]((bytes.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
          (id, bytes.length.toLong, out.length.toLong, out)
        }
      }
      .toDF("doc_id", "orig_bytes", "resized_bytes", "resized")
  }

  /** Multimodal feature extraction stub: 16-bin byte histogram as a typed
    * feature vector (`Array[Long]`) — the shape a real embedding/feature
    * kernel would produce.
    */
  def features(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    tbl(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val hist = new Array[Long](16)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xff) / 16) += 1; i += 1 }
          // CSV-serialized: the driver's rows-only checker sorts values with
          // pandas, which cannot hash an Array column — a string is sortable
          (id, hist.mkString(","))
        }
      }
      .toDF("doc_id", "byte_hist")
  }

  def all: Seq[Q] = Seq(
    Q("mm_frame_sample", frameSample, None),
    Q("mm_resize", resize, None),
    Q("mm_features", features, None),
    Q("px_remove_tiles", removePixels, Some(REMOVE_PIXELS_SQL)),
    Q("geo_annotate", annotateTiles, None),
    Q("px_pipeline", pipeline, Some(RelabelRel.MERGE_SQL)),
    Q("px_zarr_pipeline", zarrPipeline, Some(RelabelRel.MERGE_SQL)),
    Q("st_tumbling", tumblingStream, Some("""
      SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) AS bucket, event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2""")),
    Q("mm_decode_meta", decodeMeta, None)
  )
}
