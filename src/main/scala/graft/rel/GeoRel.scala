package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Relabel
import graft.tiles.{GridSpec, Tile}

/** Driver gate for the O8 composition (`labels2geojson`,
  * `relabeling.py:245-276`): a pre-labeled image pushed through the
  * `pre_overlapped = false` path — prepare (O1 halo exchange) -> remove at
  * the 0.5 default threshold (O3) -> annotate (O5) — with the REAL GeoJSON
  * output parsed back into per-feature integer facts a DuckDB oracle can
  * reconstruct.
  *
  * The input image is dense with globally-unique labels from 5x5 global
  * blocks; 5 does not divide the 12-pixel chunk, so objects straddle tile
  * boundaries and the 0.5 threshold + parity rule decide ownership
  * non-trivially. Each label's fragment inside an expanded tile is a clipped
  * rectangle (hence connected), so the traced ring's bbox equals the
  * fragment's pixel bbox — the bridge that makes contour output
  * SQL-expressible. Single-pixel fragments yield a degenerate (<2-point)
  * contour and are skipped by the kernel; the oracle mirrors that with
  * `HAVING count(*) >= 2`.
  */
object GeoRel {

  import RelabelRel.{GY, GX, L, OV}

  /** Global block edge; must not divide L so objects straddle tiles. */
  private val B = 5
  private val NBX = (GX * L + B - 1) / B

  /** Dense core label tiles: data(cy, cx) = global block id of the pixel. */
  private def labelTiles(s: SparkSession) = {
    import s.implicits._
    s.range(GY.toLong * GX).map { k =>
      val gy = (k / GX).toInt; val gx = (k % GX).toInt
      val data = new Array[Long](L * L)
      var i = 0
      while (i < data.length) {
        val yg = gy * L + i / L; val xg = gx * L + i % L
        data(i) = (yg / B).toLong * NBX + xg / B + 1
        i += 1
      }
      Tile(Array(gy, gx), Array(GY, GX), Array(L, L), data)
    }
  }

  /** (loc_key, geojson) rows -> one row per feature with the ring's bbox in
    * global pixel coordinates, parsed FROM the JSON string the annotate
    * kernel produced (not from the tiles) — gates fail if any stage,
    * including the JSON serialization itself, drifts.
    */
  private def annotationBboxes(ann: DataFrame): DataFrame = {
    val schema =
      "features ARRAY<STRUCT<geometry: STRUCT<coordinates: ARRAY<ARRAY<ARRAY<BIGINT>>>>>>"
    ann
      .select(
        split(col("loc_key"), "-").getItem(0).cast("long").as("gy"),
        split(col("loc_key"), "-").getItem(1).cast("long").as("gx"),
        explode(from_json(col("geojson"),
          org.apache.spark.sql.types.StructType.fromDDL(schema))
          .getField("features")).as("f"))
      .select(col("gy"), col("gx"),
        col("f.geometry.coordinates").getItem(0).as("ring"))
      .select(col("gy"), col("gx"),
        array_min(expr("transform(ring, p -> p[0])")).as("min_x"),
        array_min(expr("transform(ring, p -> p[1])")).as("min_y"),
        array_max(expr("transform(ring, p -> p[0])")).as("max_x"),
        array_max(expr("transform(ring, p -> p[1])")).as("max_y"))
  }

  /** O8 end-to-end (batch). */
  def labels2geojsonGate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ann = Relabel.labels2geojson(labelTiles(s),
      GridSpec(Array(GY.toLong * L, GX.toLong * L), Array(L, L)),
      Array(OV, OV))
    annotationBboxes(ann.filter(_.geojson != null).toDF("loc_key", "geojson"))
  }

  /** O9 end-to-end (`image2geojson`, `relabeling.py:279-309`): prepare ->
    * segment -> remove(0.5) -> annotate through the single public
    * composition entry point — the last public API without its own driver
    * gate. The segmentation reads the instance ids straight off the
    * halo-exchanged image values (the input IS pre-labeled, the
    * `IdentitySegmentation` ingest shape), so the detected label field
    * equals the O8 gate's and the SAME oracle applies; what this gate adds
    * is the O9 composition itself — the `pre_overlapped = true` hand-off
    * from segment into labels2geojson, previously covered only by the
    * golden spec.
    */
  def image2geojsonGate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ann = Relabel.image2geojson(labelTiles(s),
      GridSpec(Array(GY.toLong * L, GX.toLong * L), Array(L, L)),
      graft.ops.IdentitySegmentation(), Array(OV, OV))
    annotationBboxes(ann.filter(_.geojson != null).toDF("loc_key", "geojson"))
  }

  private val sinkCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Staging dir for the streaming ingest, one per JVM, removed on exit. */
  private lazy val stageDir: String = graft.TempDirs.create("graft_geo_stage")

  /** O8 as ONE STREAMING QUERY: labeled tiles stream in (any order, any
    * microbatching), the stateful halo exchange runs prepare with an
    * identity segmentation, the remove kernel applies the 0.5 default, and
    * the annotate kernel emits GeoJSON per completed tile — gated by the
    * SAME oracle as the batch gate.
    */
  def labels2geojsonStreamed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // fresh per-invocation subdirectory: overwriting a SHARED staging dir
    // could delete parquet files out from under a concurrent invocation's
    // still-active file-source stream
    val n = sinkCounter.incrementAndGet()
    val stage = stageDir + "/in_" + n
    graft.sources.TileIO.write(labelTiles(s), stage)
    val schema = s.read.parquet(stage).schema
    val stream = s.readStream.schema(schema).parquet(stage)
      .select("loc", "grid", "shape", "data", "classes").as[graft.tiles.Tile]
    val removed = graft.streaming.StreamingTiles.expandSegmentRemoveStream(
      stream, Array(OV, OV), graft.ops.IdentitySegmentation(), 0.5)
    val ann = graft.geojson.Annotate.annotateLabeledTiles(removed, Array(OV, OV))
    val qn = "st_geo_sink_" + n
    val query = graft.streaming.StateSizing.startSized(s)(
      ann.filter(_.geojson != null).toDF("loc_key", "geojson")
        .writeStream.outputMode("append").format("memory").queryName(qn)
        .start())
    try query.processAllAvailable()
    finally query.stop()
    annotationBboxes(s.table(qn))
  }

  // ---- SQL reconstruction (expanded frame, border-aware) -------------------

  private def low(g: String) = s"(CASE WHEN $g > 0 THEN $OV ELSE 0 END)"

  private def coreAxis(g: String, e: String) =
    s"($e >= ${low(g)} AND $e < ${low(g)} + $L)"
  private val CORE = coreAxis("gy", "ey") + " AND " + coreAxis("gx", "ex")

  private def srcAxis(lvl: String, g: String, e: String, gmax: Int) =
    s"""(($lvl = -1 AND ${coreAxis(g, e)})
      OR ($lvl = 1 AND $g < $gmax AND $e >= ${low(g)} + $L)
      OR ($lvl = 0 AND $g > 0 AND $e < $OV))"""
  private val SRC_MEMBER =
    srcAxis("ly", "gy", "ey", GY - 1) + " AND " + srcAxis("lx", "gx", "ex", GX - 1)

  private val PARITY = RelabelRel.parityPred
  private val REGIONS_SQL = RelabelRel.regionsSqlAs("regions")

  val SQL: String = s"""
    WITH grid AS (
      SELECT ty.y AS gy, tx.x AS gx
      FROM range(0, $GY) ty(y), range(0, $GX) tx(x)),
    epix AS (
      SELECT g.gy, g.gx, py.e AS ey, px.e AS ex,
             g.gy * $L + py.e - ${low("g.gy")} AS yg,
             g.gx * $L + px.e - ${low("g.gx")} AS xg
      FROM grid g, range(0, ${L + 2 * OV}) py(e), range(0, ${L + 2 * OV}) px(e)
      WHERE py.e < $L + ${low("g.gy")} + (CASE WHEN g.gy < ${GY - 1} THEN $OV ELSE 0 END)
        AND px.e < $L + ${low("g.gx")} + (CASE WHEN g.gx < ${GX - 1} THEN $OV ELSE 0 END)),
    lab2 AS (
      SELECT gy, gx, ey, ex, yg, xg,
             (yg // $B) * $NBX + xg // $B + 1 AS label
      FROM epix),
    stats AS (
      SELECT gy, gx, label, count(*) AS total,
             count(*) FILTER (WHERE $CORE) AS intr
      FROM lab2 GROUP BY gy, gx, label),
    first_region AS (
      SELECT gy, gx, label,
             min(CASE WHEN $PARITY THEN rid * 2 + 1 ELSE rid * 2 END) AS first2
      FROM lab2 JOIN $REGIONS_SQL ON $SRC_MEMBER
      GROUP BY gy, gx, label),
    survivors AS (
      SELECT s.gy, s.gx, s.label
      FROM stats s LEFT JOIN first_region f
        ON s.gy = f.gy AND s.gx = f.gx AND s.label = f.label
      WHERE CAST(s.intr AS DOUBLE) / CAST(s.total AS DOUBLE) >= 0.5
        AND NOT (CAST(s.intr AS DOUBLE) / CAST(s.total AS DOUBLE) <= 0.5
                 AND f.first2 IS NOT NULL AND f.first2 % 2 = 1))
    SELECT l.gy, l.gx,
           min(l.xg) AS min_x, min(l.yg) AS min_y,
           max(l.xg) AS max_x, max(l.yg) AS max_y
    FROM lab2 l JOIN survivors v
      ON l.gy = v.gy AND l.gx = v.gx AND l.label = v.label
    GROUP BY l.gy, l.gx, l.label
    HAVING count(*) >= 2"""

  def all: Seq[Q] = Seq(
    Q("geo_labels2geojson", labels2geojsonGate, Some(SQL)),
    Q("geo_image2geojson", image2geojsonGate, Some(SQL)),
    Q("st_geo_labels2geojson", labels2geojsonStreamed, Some(SQL)))
}
