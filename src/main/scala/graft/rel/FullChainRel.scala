package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.Relabel
import graft.tiles.GridSpec

/** The capstone oracle: the COMPLETE `image2labels` composition (O7 —
  * prepare -> segment -> remove -> merge -> trim/crop) driven through the
  * real tile engine with both halo-exchange shuffles, checked against one
  * DuckDB SQL that reconstructs every stage on expanded-frame coordinates.
  *
  * Expanded tiles vary in size (12 + one overlap per neighbored side), so
  * unlike [[RelabelRel]] (uniform pre-overlapped 12x12 tiles) every
  * interior/region/destination predicate here is border-aware via the
  * low-halo offset `lowOff = (coord > 0 ? 2 : 0)`; the high-halo rows are
  * exactly `[lowOff + 12, lowOff + 14)` when a high neighbor exists.
  */
object FullChainRel {

  import RelabelRel.{GY, GX, L, OV, THRESHOLD, OFFSET_UNIT}

  /** Spark side: the real pipeline, exploded to core-frame labeled pixels.
    * The image is exactly grid*chunk so the final crop is the identity —
    * tiles come back chunk-sized from the merge trim.
    */
  def imagePixels(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val out = Relabel.image2labels(HaloRel.coreTiles(s, d),
      GridSpec(Array(GY.toLong * L, GX.toLong * L), Array(L, L)),
      HaloRel.BlockSegmentation(), Array(OV, OV), THRESHOLD)
    out.flatMap { t =>
      val w = t.shape(1)
      for {
        y <- 0 until t.shape(0); x <- 0 until w
        v = t.data(y * w + x)
        if v != 0L
      } yield (t.loc(0).toLong, t.loc(1).toLong, y.toLong, x.toLong, v)
    }.toDF("gy", "gx", "py", "px", "gid")
  }

  // ---- SQL assembly -------------------------------------------------------

  private def low(g: String) = s"(CASE WHEN $g > 0 THEN $OV ELSE 0 END)"

  /** Interior (== core rows) of the expanded frame, per axis. */
  private def coreAxis(g: String, e: String) =
    s"($e >= ${low(g)} AND $e < ${low(g)} + $L)"
  private val CORE = coreAxis("gy", "ey") + " AND " + coreAxis("gx", "ex")

  /** Region source-box membership on the expanded own frame. */
  private def srcAxis(lvl: String, g: String, e: String, gmax: Int) =
    s"""(($lvl = -1 AND ${coreAxis(g, e)})
      OR ($lvl = 1 AND $g < $gmax AND $e >= ${low(g)} + $L)
      OR ($lvl = 0 AND $g > 0 AND $e < $OV))"""
  private val SRC_MEMBER =
    srcAxis("ly", "gy", "ey", GY - 1) + " AND " + srcAxis("lx", "gx", "ex", GX - 1)

  private val PARITY = RelabelRel.parityPred
  private def regionsAs(alias: String) = RelabelRel.regionsSqlAs(alias)
  private val REGIONS_SQL = regionsAs("regions")

  /** Shipped-margin membership on the SENDER's expanded frame for the merge
    * exchange (what `Halo.mergeAndTrim` slices): level 1 consumes the
    * sender's FIRST OV rows, level 0 the sender's LAST OV rows (high halo),
    * fixed axes the full frame.
    */
  private def shipAxis(lvl: String, g: String, e: String) =
    s"""(($lvl = -1) OR ($lvl = 1 AND $e < $OV)
      OR ($lvl = 0 AND $e >= ${low(g)} + $L))"""

  /** Receiver-frame position of the shipped sender pixel. Receiver coord
    * `rg = g - dir(level)`; level 1 dst rows are the last OV core rows
    * `[lowR + L - OV, lowR + L)`, level 0 dst rows the first OV core rows
    * `[OV, 2*OV)` (receiver coord > 0 so lowR = OV there).
    */
  private def dstPos(lvl: String, g: String, rg: String, e: String) =
    s"""CASE WHEN $lvl = 1 THEN ${low(rg)} + ${L - OV} + $e
             WHEN $lvl = 0 THEN $OV + ($e - ${low(g)} - $L)
             ELSE $e END"""

  val SQL: String = s"""
    WITH exp0 AS (${HaloRel.EXPAND_SQL}),
    seg AS (
      SELECT gy, gx, ey, ex, (ey // 3) * 6 + (ex // 3) + 1 AS label
      FROM exp0),
    stats AS (
      SELECT gy, gx, label, count(*) AS total,
             count(*) FILTER (WHERE $CORE) AS intr
      FROM seg GROUP BY gy, gx, label),
    first_region AS (
      SELECT gy, gx, label,
             min(CASE WHEN $PARITY THEN rid * 2 + 1 ELSE rid * 2 END) AS first2
      FROM seg JOIN $REGIONS_SQL ON $SRC_MEMBER
      GROUP BY gy, gx, label),
    removed AS (
      SELECT s.gy, s.gx, s.label,
             s.label + (s.gy * $GX + s.gx) * $OFFSET_UNIT AS gid
      FROM stats s LEFT JOIN first_region f
        ON s.gy = f.gy AND s.gx = f.gx AND s.label = f.label
      WHERE CAST(s.intr AS DOUBLE) / CAST(s.total AS DOUBLE) >= $THRESHOLD
        AND NOT (CAST(s.intr AS DOUBLE) / CAST(s.total AS DOUBLE) <= ${1 - THRESHOLD}
                 AND f.first2 IS NOT NULL AND f.first2 % 2 = 1)),
    rp AS (
      SELECT g.gy, g.gx, g.ey, g.ex, r.gid
      FROM seg g JOIN removed r
        ON g.gy = r.gy AND g.gx = r.gx AND g.label = r.label),
    own AS (
      SELECT gy, gx, ey, ex, gid, CAST(-1 AS BIGINT) AS prio FROM rp),
    painted AS (
      SELECT p.gy - CASE WHEN r.ly = 1 THEN 1 WHEN r.ly = 0 THEN -1 ELSE 0 END AS gy,
             p.gx - CASE WHEN r.lx = 1 THEN 1 WHEN r.lx = 0 THEN -1 ELSE 0 END AS gx,
             ${dstPos("r.ly",
                      "p.gy",
                      "(p.gy - CASE WHEN r.ly = 1 THEN 1 WHEN r.ly = 0 THEN -1 ELSE 0 END)",
                      "p.ey")} AS ey,
             ${dstPos("r.lx",
                      "p.gx",
                      "(p.gx - CASE WHEN r.lx = 1 THEN 1 WHEN r.lx = 0 THEN -1 ELSE 0 END)",
                      "p.ex")} AS ex,
             r.ly AS ly, r.lx AS lx, p.gid AS gid, CAST(r.rid AS BIGINT) AS prio
      FROM rp p JOIN ${regionsAs("r")}
        ON ${shipAxis("r.ly", "p.gy", "p.ey")} AND ${shipAxis("r.lx", "p.gx", "p.ex")}),
    cand AS (
      SELECT gy, gx, ey, ex, gid, prio FROM own
      UNION ALL
      SELECT gy, gx, ey, ex, gid, prio FROM painted
      WHERE gy >= 0 AND gy < $GY AND gx >= 0 AND gx < $GX
        AND ((ly != -1 AND gy % 2 = 1) OR (lx != -1 AND gx % 2 = 1))),
    merged AS (
      SELECT gy, gx, ey, ex, arg_max(gid, prio) AS gid
      FROM cand GROUP BY gy, gx, ey, ex
      HAVING $CORE)
    SELECT gy, gx, ey - ${low("gy")} AS py, ex - ${low("gx")} AS px, gid
    FROM merged"""

  /** The same full chain as ONE STREAMING QUERY: core tiles are written to
    * a per-JVM parquet staging dir, read back as a stream, and pushed
    * through BOTH stateful halo exchanges chained in append mode — expand +
    * segment + remove, then the parity-pruned merge
    * ([[graft.streaming.StreamingTiles]]). Hash-matching the SAME oracle as
    * px_image2labels proves the incremental ingestion path end-to-end, not
    * just against the batch engine.
    */
  def imagePixelsStreamed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // fresh per-invocation subdirectory: overwriting a SHARED staging dir
    // could delete parquet files out from under a concurrent invocation's
    // still-active file-source stream
    val n = sinkCounter.incrementAndGet()
    val stage = stageDir + "/in_" + n
    graft.sources.TileIO.write(HaloRel.coreTiles(s, d), stage)
    val schema = s.read.parquet(stage).schema
    val stream = s.readStream.schema(schema).parquet(stage)
      .select("loc", "grid", "shape", "data", "classes").as[graft.tiles.Tile]
    val qn = "st_px_sink_" + n
    val merged = graft.streaming.StreamingTiles.mergeStream(
      graft.streaming.StreamingTiles.expandSegmentRemoveStream(
        stream, Array(OV, OV), HaloRel.BlockSegmentation(), THRESHOLD),
      Array(OV, OV))
    graft.streaming.StreamingTiles.withChainedStatefulAllowed(s) {
      val query = graft.streaming.StateSizing.startSized(s)(
        merged.writeStream.outputMode("append")
          .format("memory").queryName(qn).start())
      try query.processAllAvailable()
      finally query.stop()
    }
    s.table(qn)
      .select("loc", "grid", "shape", "data", "classes").as[graft.tiles.Tile]
      .flatMap { t =>
        val w = t.shape(1)
        for {
          y <- 0 until t.shape(0); x <- 0 until w
          v = t.data(y * w + x)
          if v != 0L
        } yield (t.loc(0).toLong, t.loc(1).toLong, y.toLong, x.toLong, v)
      }.toDF("gy", "gx", "py", "px", "gid")
  }

  private val sinkCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Staging dir for the streaming ingest, one per JVM, removed on exit. */
  private lazy val stageDir: String = graft.TempDirs.create("graft_stage")

  def all: Seq[Q] = Seq(
    Q("px_image2labels", imagePixels, Some(SQL)),
    Q("st_px_image2labels", imagePixelsStreamed, Some(SQL)))
}
