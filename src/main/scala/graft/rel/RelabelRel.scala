package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q.tbl
import graft.Caching

/** Relational (DuckDB-checkable) formulations of the relabel operators
  * (SURVEY.md §2.4/§2.5) over a deterministic synthetic tile grid derived
  * from `lineitem` keys: a 6x4 grid of 12x12 (overlapped) tiles, overlap 2,
  * threshold 0.25, with fake "objects" = 3x3 pixel blocks so labels straddle
  * margins in interesting ways. These double as differential tests of the
  * tile kernels (`RelationalParitySpec`).
  *
  * Region precedence is implemented exactly as the reference's scan
  * (`chunkops.py:59-79`): the enumeration is dimension-descending
  * (`utils.py:68-88`) and codes are only overwritten by strictly
  * higher-dimensional regions, so the winning region is the FIRST enumerated
  * one containing the label — a `min(rid)` after a membership join against
  * the 8-row broadcast region table. Packing parity into the low bit
  * (`rid * 2 + parity`) lets one `min` recover both.
  */
object RelabelRel {

  val GY = 6; val GX = 4; val L = 12; val OV = 2
  val THRESHOLD = 0.25
  /** `2^31 / (6*4) + 2^31` (`chunkops.py:93-94`). */
  val OFFSET_UNIT: Long = 2147483648L / (GY * GX) + 2147483648L

  /** Region enumeration (rid, levelY, levelX, dim); -1 = axis not varying. */
  val REGIONS: Seq[(Int, Int, Int, Int)] = Seq(
    (0, 0, 0, 2), (1, 1, 0, 2), (2, 0, 1, 2), (3, 1, 1, 2),
    (4, -1, 0, 1), (5, -1, 1, 1), (6, 0, -1, 1), (7, 1, -1, 1))

  // ---------------------------------------------------------------- pixels

  /** Non-deduplicated variant for tile building: duplicate (tile, pixel)
    * rows write the same label into the same cell, so the groupByKey
    * assembly is idempotent and the `distinct()` exchange can be skipped —
    * one shuffle instead of two for every engine-side query.
    */
  def pixelsRaw(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "lineitem")
      .select(
        expr(s"CAST(l_orderkey % $GY AS BIGINT)").as("gy"),
        expr(s"CAST(l_partkey % $GX AS BIGINT)").as("gx"),
        expr(s"CAST((l_orderkey div 7 + l_linenumber * 3) % $L AS BIGINT)").as("py"),
        expr(s"CAST((l_partkey div 5 + l_suppkey) % $L AS BIGINT)").as("px"))
      .filter(expr(s"(py * 31 + px * 17 + gy * 7 + gx * 3) % 10 < 6"))
      .withColumn("label", expr(s"(py div 3) * 4 + (px div 3) + 1"))

  def pixels(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "lineitem")
      .select(
        expr(s"CAST(l_orderkey % $GY AS BIGINT)").as("gy"),
        expr(s"CAST(l_partkey % $GX AS BIGINT)").as("gx"),
        expr(s"CAST((l_orderkey div 7 + l_linenumber * 3) % $L AS BIGINT)").as("py"),
        expr(s"CAST((l_partkey div 5 + l_suppkey) % $L AS BIGINT)").as("px"))
      .distinct()
      .filter(expr(s"(py * 31 + px * 17 + gy * 7 + gx * 3) % 10 < 6"))
      .withColumn("label", expr(s"(py div 3) * 4 + (px div 3) + 1"))

  val PIXELS_SQL: String = s"""
    WITH pix AS (
      SELECT DISTINCT CAST(l_orderkey % $GY AS BIGINT) AS gy,
             CAST(l_partkey % $GX AS BIGINT) AS gx,
             CAST((l_orderkey // 7 + l_linenumber * 3) % $L AS BIGINT) AS py,
             CAST((l_partkey // 5 + l_suppkey) % $L AS BIGINT) AS px
      FROM lineitem),
    lab AS (
      SELECT gy, gx, py, px, (py // 3) * 4 + (px // 3) + 1 AS label
      FROM pix WHERE (py * 31 + px * 17 + gy * 7 + gx * 3) % 10 < 6)"""

  // ------------------------------------------------------- shared predicates

  private def iif(c: String, t: String, f: String, spark: Boolean) =
    if (spark) s"IF($c, $t, $f)" else s"CASE WHEN $c THEN $t ELSE $f END"

  private def interiorPred(spark: Boolean) =
    s"""(py >= ${iif(s"gy > 0", s"$OV", "0", spark)}
         AND py < ${iif(s"gy < ${GY - 1}", s"${L - OV}", s"$L", spark)}
         AND px >= ${iif(s"gx > 0", s"$OV", "0", spark)}
         AND px < ${iif(s"gx < ${GX - 1}", s"${L - OV}", s"$L", spark)})"""

  /** Region validity + pixel membership in the region's source box
    * (`utils.py:82-85`, `utils.py:131-143`).
    */
  private def regionMember(spark: Boolean) = {
    def axis(lvl: String, g: String, p: String, gmax: Int) =
      s"""(($lvl = -1 AND $p >= ${iif(s"$g > 0", s"$OV", "0", spark)}
            AND $p < ${iif(s"$g < $gmax", s"${L - OV}", s"$L", spark)})
        OR ($lvl = 1 AND $g < $gmax AND $p >= ${L - OV})
        OR ($lvl = 0 AND $g > 0 AND $p < $OV))"""
    axis("ly", "gy", "py", GY - 1) + " AND " + axis("lx", "gx", "px", GX - 1)
  }

  /** Receiver-parity rule shared by every relabel oracle (`utils.py:101-110`). */
  private[rel] val parityPred =
    "((ly != -1 AND gy % 2 = 1) OR (lx != -1 AND gx % 2 = 1))"

  private val keepPred =
    s"""p >= $THRESHOLD AND NOT (p <= ${1 - THRESHOLD}
        AND first2 IS NOT NULL AND first2 % 2 = 1)"""

  private def regionDf(s: SparkSession): DataFrame = {
    import s.implicits._
    REGIONS.toDF("rid", "ly", "lx", "rdim")
  }

  private[rel] def regionsSqlAs(alias: String) =
    "(VALUES " + REGIONS.map { case (r, ly, lx, dm) => s"($r,$ly,$lx,$dm)" }
      .mkString(", ") + s") AS $alias(rid, ly, lx, rdim)"
  private val REGIONS_SQL = regionsSqlAs("regions")

  // ------------------------------------------------------------ margin stats

  def marginStats(s: SparkSession, d: String): DataFrame =
    pixels(s, d)
      .groupBy("gy", "gx", "label")
      .agg(count(lit(1)).as("total"),
        count_if(expr(interiorPred(spark = true))).as("intr"))

  val MARGIN_STATS_SQL: String = PIXELS_SQL + s"""
    SELECT gy, gx, label, count(*) AS total,
           count(*) FILTER (WHERE ${interiorPred(spark = false)}) AS intr
    FROM lab GROUP BY gy, gx, label"""

  // ------------------------------------------------------------------ remove

  def remove(s: SparkSession, d: String): DataFrame = {
    // pixels feed both the stats aggregate and the region-membership join;
    // cache once (CacheManager plan-canonical reuse covers both reads) and
    // release when the consuming action completes
    val px = pixels(s, d)
    val stats = marginStats(s, d)
      .withColumn("p", col("intr").cast("double") / col("total").cast("double"))
    val firstRegion = pixels(s, d)
      .join(broadcast(regionDf(s)), expr(regionMember(spark = true)))
      .groupBy("gy", "gx", "label")
      .agg(min(expr(s"IF($parityPred, rid * 2 + 1, rid * 2)")).as("first2"))
    Caching.releaseAfterAction(
      stats
        .join(firstRegion, Seq("gy", "gx", "label"), "left")
        .filter(expr(keepPred))
        .select(col("gy"), col("gx"), col("label"),
          expr(s"label + (gy * $GX + gx) * ${OFFSET_UNIT}L").as("gid")),
      px)
  }

  /** CTEs appended after PIXELS_SQL yielding `removed(gy,gx,label,gid)`. */
  private[rel] val REMOVE_CTES: String = s""",
    stats AS (
      SELECT gy, gx, label, count(*) AS total,
             count(*) FILTER (WHERE ${interiorPred(spark = false)}) AS intr
      FROM lab GROUP BY gy, gx, label),
    first_region AS (
      SELECT gy, gx, label,
             min(CASE WHEN $parityPred THEN rid * 2 + 1 ELSE rid * 2 END) AS first2
      FROM lab JOIN $REGIONS_SQL ON ${regionMember(spark = false)}
      GROUP BY gy, gx, label),
    removed AS (
      SELECT s.gy, s.gx, s.label,
             s.label + (s.gy * $GX + s.gx) * $OFFSET_UNIT AS gid
      FROM stats s LEFT JOIN first_region f
        ON s.gy = f.gy AND s.gx = f.gx AND s.label = f.label
      WHERE CAST(s.intr AS DOUBLE) / CAST(s.total AS DOUBLE) >= $THRESHOLD
        AND NOT (CAST(s.intr AS DOUBLE) / CAST(s.total AS DOUBLE) <= ${1 - THRESHOLD}
                 AND f.first2 IS NOT NULL AND f.first2 % 2 = 1))"""

  val REMOVE_SQL: String =
    PIXELS_SQL + REMOVE_CTES + " SELECT gy, gx, label, gid FROM removed"

  // ------------------------------------------------------------------- merge

  def merge(s: SparkSession, d: String): DataFrame = {
    val rp = pixels(s, d)
      .join(remove(s, d).select("gy", "gx", "label", "gid"),
        Seq("gy", "gx", "label"))
    val own = rp.select(col("gy"), col("gx"), col("py"), col("px"),
      col("gid"), lit(-1L).as("prio"))
    val painted = rp
      .join(broadcast(regionDf(s)), expr(
        s"""((ly = -1) OR (ly = 1 AND py < $OV) OR (ly = 0 AND py >= ${L - OV}))
            AND ((lx = -1) OR (lx = 1 AND px < $OV) OR (lx = 0 AND px >= ${L - OV}))"""))
      .select(
        expr("gy - IF(ly = 1, 1, IF(ly = 0, -1, 0))").as("rgy"),
        expr("gx - IF(lx = 1, 1, IF(lx = 0, -1, 0))").as("rgx"),
        expr(s"py + IF(ly = 1, ${L - 2 * OV}, IF(ly = 0, ${-(L - 2 * OV)}, 0))").as("py"),
        expr(s"px + IF(lx = 1, ${L - 2 * OV}, IF(lx = 0, ${-(L - 2 * OV)}, 0))").as("px"),
        col("ly"), col("lx"), col("gid"), col("rid").cast("long").as("prio"))
      .filter(expr(s"rgy >= 0 AND rgy < $GY AND rgx >= 0 AND rgx < $GX"))
      // receiver-side parity: the region merges iff a varying axis has an
      // odd receiver coordinate (`utils.py:101-110`)
      .filter(expr("(ly != -1 AND rgy % 2 = 1) OR (lx != -1 AND rgx % 2 = 1)"))
      .select(col("rgy").as("gy"), col("rgx").as("gx"), col("py"), col("px"),
        col("gid"), col("prio"))
    Caching.releaseAfterAction(
      own.unionByName(painted)
        .groupBy("gy", "gx", "py", "px")
        .agg(max_by(col("gid"), col("prio")).as("gid"))
        .filter(expr(interiorPred(spark = true))),
      rp)
  }

  val MERGE_SQL: String = PIXELS_SQL + REMOVE_CTES + s""",
    rp AS (
      SELECT l.gy, l.gx, l.py, l.px, r.gid
      FROM lab l JOIN removed r
        ON l.gy = r.gy AND l.gx = r.gx AND l.label = r.label),
    own AS (
      SELECT gy, gx, py, px, gid, CAST(-1 AS BIGINT) AS prio FROM rp),
    painted AS (
      SELECT p.gy - CASE WHEN r.ly = 1 THEN 1 WHEN r.ly = 0 THEN -1 ELSE 0 END AS gy,
             p.gx - CASE WHEN r.lx = 1 THEN 1 WHEN r.lx = 0 THEN -1 ELSE 0 END AS gx,
             p.py + CASE WHEN r.ly = 1 THEN ${L - 2 * OV}
                         WHEN r.ly = 0 THEN ${-(L - 2 * OV)} ELSE 0 END AS py,
             p.px + CASE WHEN r.lx = 1 THEN ${L - 2 * OV}
                         WHEN r.lx = 0 THEN ${-(L - 2 * OV)} ELSE 0 END AS px,
             r.ly AS ly, r.lx AS lx, p.gid AS gid, CAST(r.rid AS BIGINT) AS prio
      FROM rp p JOIN ${regionsSqlAs("r")} ON
           ((r.ly = -1) OR (r.ly = 1 AND p.py < $OV) OR (r.ly = 0 AND p.py >= ${L - OV}))
       AND ((r.lx = -1) OR (r.lx = 1 AND p.px < $OV) OR (r.lx = 0 AND p.px >= ${L - OV}))),
    cand AS (
      SELECT gy, gx, py, px, gid, prio FROM own
      UNION ALL
      SELECT gy, gx, py, px, gid, prio FROM painted
      WHERE gy >= 0 AND gy < $GY AND gx >= 0 AND gx < $GX
        AND ((ly != -1 AND gy % 2 = 1) OR (lx != -1 AND gx % 2 = 1)))
    SELECT gy, gx, py, px, arg_max(gid, prio) AS gid
    FROM cand GROUP BY gy, gx, py, px
    HAVING ${interiorPred(spark = false)}"""

  // -------------------------------------------------------------------- sort

  def sortRank(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tiny output (distinct labels), so a global-order window is fine here;
    // the tile-form engine uses the broadcast-map variant (Relabel.
    // sortLabelIndices) to avoid a single-partition sort at scale.
    remove(s, d).select("gid").distinct()
      .unionByName(s.range(1).select(lit(0L).as("gid")))
      .withColumn("rank",
        dense_rank().over(Window.orderBy(col("gid"))).cast("long") - 1)
  }

  val SORT_SQL: String = PIXELS_SQL + REMOVE_CTES + s"""
    SELECT gid, CAST(dense_rank() OVER (ORDER BY gid) AS BIGINT) - 1 AS rank
    FROM (SELECT DISTINCT gid FROM removed UNION SELECT CAST(0 AS BIGINT) AS gid)"""

  // ------------------------------------------------------------------- count

  /** The notebooks' correctness proxy: distinct surviving object count. */
  def objectCount(s: SparkSession, d: String): DataFrame =
    remove(s, d).agg(countDistinct("gid").as("n_objects"),
      count(lit(1)).as("n_rows"))

  val COUNT_SQL: String = PIXELS_SQL + REMOVE_CTES + """
    SELECT count(DISTINCT gid) AS n_objects, count(*) AS n_rows FROM removed"""

  /** Region properties — the `skimage.measure.regionprops` adjunct every
    * consumer of a labeled image runs next (the reference emits labels
    * and contours; area/bbox/centroid/extent are the measurement table a
    * downstream analysis joins on): per (tile, label), pixel area, the
    * bounding box, exact centroid numerators plus the single-division
    * centroid, and extent (area over bbox area). One hash aggregate over
    * the pixel relation — the same single-shuffle shape as marginStats.
    */
  def regionProps(s: SparkSession, d: String): DataFrame =
    pixels(s, d)
      .groupBy("gy", "gx", "label")
      .agg(count(lit(1)).as("area"),
        min("py").as("y0"), max("py").as("y1"),
        min("px").as("x0"), max("px").as("x1"),
        sum("py").as("sy"), sum("px").as("sx"))
      .withColumn("cy", expr("sy / area"))
      .withColumn("cx", expr("sx / area"))
      .withColumn("extent", expr("area / ((y1 - y0 + 1) * (x1 - x0 + 1))"))

  val REGIONPROPS_SQL: String = PIXELS_SQL + s"""
    SELECT gy, gx, label, count(*) AS area,
           min(py) AS y0, max(py) AS y1, min(px) AS x0, max(px) AS x1,
           CAST(sum(py) AS BIGINT) AS sy, CAST(sum(px) AS BIGINT) AS sx,
           CAST(sum(py) AS BIGINT) / count(*) AS cy,
           CAST(sum(px) AS BIGINT) / count(*) AS cx,
           count(*) / ((max(py) - min(py) + 1) * (max(px) - min(px) + 1))
             AS extent
    FROM lab GROUP BY gy, gx, label"""

  def all: Seq[Q] = Seq(
    Q("rl_margin_stats", marginStats, Some(MARGIN_STATS_SQL)),
    Q("rl_remove", remove, Some(REMOVE_SQL)),
    Q("rl_merge", merge, Some(MERGE_SQL)),
    Q("rl_sort", sortRank, Some(SORT_SQL)),
    Q("rl_count", objectCount, Some(COUNT_SQL)),
    Q("px_regionprops", regionProps, Some(REGIONPROPS_SQL)))
}
