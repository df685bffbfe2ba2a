package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Regions
import graft.ops.Relabel
import graft.tiles.Tile
import Q.tbl

/** 3D gate coverage: the tile engine's remove/merge over a 3x4x3 grid of
  * pre-overlapped 8^3 tiles (26 neighbor regions per interior chunk),
  * hash-checked against axis-generic SQL oracles. The region table is
  * GENERATED from `Regions.validOverlaps` at an interior location so the
  * enumeration order in the SQL is by construction the kernel's order.
  */
object Relabel3Rel {

  val G = Array(3, 4, 3) // gz, gy, gx
  val L3 = 8; val OV3 = 2
  val THR = 0.25
  val OFFSET3: Long = 2147483648L / (G(0) * G(1) * G(2)) + 2147483648L

  private val gCols = Array("gz", "gy", "gx")
  private val pCols = Array("pz", "py", "px")
  private val lCols = Array("lz", "ly", "lx")

  /** All 26 regions in exact kernel enumeration order. */
  private val regions3: Seq[(Int, Array[Int])] =
    Regions.validOverlaps(Array(1, 1, 1), Array(3, 3, 3)).zipWithIndex
      .map { case (lv, i) => (i, lv) }

  private val REGIONS3_SQL =
    "(VALUES " + regions3.map { case (rid, lv) =>
      s"($rid,${lv(0)},${lv(1)},${lv(2)},${Regions.regionDim(lv)})"
    }.mkString(", ") + ") AS regions(rid, lz, ly, lx, rdim)"

  // ------------------------------------------------------------- pixel grid

  def pixels3(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "lineitem")
      .select(
        expr(s"CAST(l_suppkey % ${G(0)} AS BIGINT)").as("gz"),
        expr(s"CAST(l_orderkey % ${G(1)} AS BIGINT)").as("gy"),
        expr(s"CAST(l_partkey % ${G(2)} AS BIGINT)").as("gx"),
        expr(s"CAST((l_orderkey div 11) % $L3 AS BIGINT)").as("pz"),
        expr(s"CAST((l_linenumber * 3 + l_orderkey div 7) % $L3 AS BIGINT)").as("py"),
        expr(s"CAST((l_partkey div 5 + l_suppkey) % $L3 AS BIGINT)").as("px"))
      // no distinct: tile assembly dedups idempotently (same label per cell)
      .filter(expr("(pz * 29 + py * 31 + px * 17 + gz * 5 + gy * 7 + gx * 3) % 10 < 6"))
      .withColumn("label",
        expr("(pz div 3) * 9 + (py div 3) * 3 + (px div 3) + 1"))

  val PIXELS3_SQL: String = s"""
    WITH pix AS (
      SELECT DISTINCT CAST(l_suppkey % ${G(0)} AS BIGINT) AS gz,
             CAST(l_orderkey % ${G(1)} AS BIGINT) AS gy,
             CAST(l_partkey % ${G(2)} AS BIGINT) AS gx,
             CAST((l_orderkey // 11) % $L3 AS BIGINT) AS pz,
             CAST((l_linenumber * 3 + l_orderkey // 7) % $L3 AS BIGINT) AS py,
             CAST((l_partkey // 5 + l_suppkey) % $L3 AS BIGINT) AS px
      FROM lineitem),
    lab AS (
      SELECT gz, gy, gx, pz, py, px,
             (pz // 3) * 9 + (py // 3) * 3 + (px // 3) + 1 AS label
      FROM pix
      WHERE (pz * 29 + py * 31 + px * 17 + gz * 5 + gy * 7 + gx * 3) % 10 < 6)"""

  // -------------------------------------------------------- SQL predicates

  private def interiorSql: String =
    (0 until 3).map { a =>
      val (g, p, gmax) = (gCols(a), pCols(a), G(a) - 1)
      s"""($p >= CASE WHEN $g > 0 THEN $OV3 ELSE 0 END
           AND $p < CASE WHEN $g < $gmax THEN ${L3 - OV3} ELSE $L3 END)"""
    }.mkString(" AND ")

  private def srcMemberSql: String =
    (0 until 3).map { a =>
      val (lv, g, p, gmax) = (lCols(a), gCols(a), pCols(a), G(a) - 1)
      s"""(($lv = -1 AND $p >= CASE WHEN $g > 0 THEN $OV3 ELSE 0 END
             AND $p < CASE WHEN $g < $gmax THEN ${L3 - OV3} ELSE $L3 END)
        OR ($lv = 1 AND $g < $gmax AND $p >= ${L3 - OV3})
        OR ($lv = 0 AND $g > 0 AND $p < $OV3))"""
    }.mkString(" AND ")

  private def paritySql: String =
    "(" + (0 until 3).map(a =>
      s"(${lCols(a)} != -1 AND ${gCols(a)} % 2 = 1)").mkString(" OR ") + ")"

  /** CTEs producing `removed(gz,gy,gx,label,gid)` after PIXELS3_SQL. */
  private val REMOVE3_CTES: String = {
    val gs = gCols.mkString(", ")
    s""",
    stats AS (
      SELECT $gs, label, count(*) AS total,
             count(*) FILTER (WHERE $interiorSql) AS intr
      FROM lab GROUP BY $gs, label),
    first_region AS (
      SELECT $gs, label,
             min(CASE WHEN $paritySql THEN rid * 2 + 1 ELSE rid * 2 END) AS first2
      FROM lab JOIN $REGIONS3_SQL ON $srcMemberSql
      GROUP BY $gs, label),
    removed AS (
      SELECT s.gz, s.gy, s.gx, s.label,
             s.label + ((s.gz * ${G(1)} + s.gy) * ${G(2)} + s.gx) * $OFFSET3 AS gid
      FROM stats s LEFT JOIN first_region f
        ON s.gz = f.gz AND s.gy = f.gy AND s.gx = f.gx AND s.label = f.label
      WHERE CAST(s.intr AS DOUBLE) / CAST(s.total AS DOUBLE) >= $THR
        AND NOT (CAST(s.intr AS DOUBLE) / CAST(s.total AS DOUBLE) <= ${1 - THR}
                 AND f.first2 IS NOT NULL AND f.first2 % 2 = 1))"""
  }

  // ------------------------------------------------------------ tile engine

  private def tiles3(s: SparkSession, d: String) = {
    import s.implicits._
    pixels3(s, d)
      .select("gz", "gy", "gx", "pz", "py", "px", "label")
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      // densify via marker rows (pz = -1), same contract as the 2D
      // constructor: every grid cell yields a tile, markers fill nothing
      .union(s.range(G(0).toLong * G(1) * G(2)).map { i =>
        (i / (G(1).toLong * G(2)), (i / G(2)) % G(1), i % G(2),
          -1L, -1L, -1L, 0L)
      })
      .groupByKey { case (gz, gy, gx, _, _, _, _) =>
        (gz * G(1) + gy) * G(2) + gx
      }
      .mapGroups { (_, it) =>
        val rows = it.toArray
        val loc = Array(rows.head._1.toInt, rows.head._2.toInt, rows.head._3.toInt)
        val data = new Array[Long](L3 * L3 * L3)
        rows.foreach { case (_, _, _, pz, py, px, label) =>
          if (pz >= 0) data((pz.toInt * L3 + py.toInt) * L3 + px.toInt) = label
        }
        Tile(loc, G.clone(), Array(L3, L3, L3), data)
      }
  }

  private def explode5(df: org.apache.spark.sql.Dataset[Tile],
                       addTrimOffset: Boolean): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.flatMap { t =>
      val off = Array.tabulate(3)(a =>
        if (addTrimOffset && t.loc(a) > 0) OV3 else 0)
      val st = graft.core.Nd.strides(t.shape)
      for {
        z <- 0 until t.shape(0); y <- 0 until t.shape(1); x <- 0 until t.shape(2)
        v = t.data(z * st(0) + y * st(1) + x)
        if v != 0L
      } yield (t.loc(0).toLong, t.loc(1).toLong, t.loc(2).toLong,
        (z + off(0)).toLong, (y + off(1)).toLong, (x + off(2)).toLong, v)
    }.toDF("gz", "gy", "gx", "pz", "py", "px", "gid")
  }

  /** O3 in 3D through the engine (26-region scan per interior chunk). */
  def remove3(s: SparkSession, d: String): DataFrame =
    explode5(Relabel.removeOverlappedLabels(tiles3(s, d),
      Array(OV3, OV3, OV3), THR), addTrimOffset = false)

  val REMOVE3_SQL: String = PIXELS3_SQL + REMOVE3_CTES + """
    SELECT l.gz, l.gy, l.gx, l.pz, l.py, l.px, r.gid
    FROM lab l JOIN removed r
      ON l.gz = r.gz AND l.gy = r.gy AND l.gx = r.gx AND l.label = r.label"""

  /** O3+O4 in 3D through the engine (merge exchange + trim). */
  def pipeline3(s: SparkSession, d: String): DataFrame = {
    val removed = Relabel.removeOverlappedLabels(tiles3(s, d),
      Array(OV3, OV3, OV3), THR)
    explode5(Relabel.mergeOverlappedTiles(removed, Array(OV3, OV3, OV3)),
      addTrimOffset = true)
  }

  val PIPELINE3_SQL: String = {
    val gs = gCols.mkString(", ")
    val ps = pCols.mkString(", ")
    // uniform pre-overlapped tiles: dst/src shift by L-2*OV per varying axis
    val sh = L3 - 2 * OV3
    def recvG(a: Int) =
      s"p.${gCols(a)} - CASE WHEN r.${lCols(a)} = 1 THEN 1 WHEN r.${lCols(a)} = 0 THEN -1 ELSE 0 END"
    def recvP(a: Int) =
      s"p.${pCols(a)} + CASE WHEN r.${lCols(a)} = 1 THEN $sh WHEN r.${lCols(a)} = 0 THEN ${-sh} ELSE 0 END"
    def shipMember(a: Int) =
      s"""((r.${lCols(a)} = -1) OR (r.${lCols(a)} = 1 AND p.${pCols(a)} < $OV3)
        OR (r.${lCols(a)} = 0 AND p.${pCols(a)} >= ${L3 - OV3}))"""
    PIXELS3_SQL + REMOVE3_CTES + s""",
    rp AS (
      SELECT l.gz, l.gy, l.gx, l.pz, l.py, l.px, r.gid
      FROM lab l JOIN removed r
        ON l.gz = r.gz AND l.gy = r.gy AND l.gx = r.gx AND l.label = r.label),
    own AS (SELECT $gs, $ps, gid, CAST(-1 AS BIGINT) AS prio FROM rp),
    painted AS (
      SELECT ${(0 until 3).map(a => s"${recvG(a)} AS ${gCols(a)}").mkString(", ")},
             ${(0 until 3).map(a => s"${recvP(a)} AS ${pCols(a)}").mkString(", ")},
             r.lz AS lz, r.ly AS ly, r.lx AS lx,
             p.gid AS gid, CAST(r.rid AS BIGINT) AS prio
      FROM rp p JOIN ${REGIONS3_SQL.replace("AS regions", "AS r")}
        ON ${(0 until 3).map(shipMember).mkString(" AND ")}),
    cand AS (
      SELECT $gs, $ps, gid, prio FROM own
      UNION ALL
      SELECT $gs, $ps, gid, prio FROM painted
      WHERE ${(0 until 3).map(a =>
        s"${gCols(a)} >= 0 AND ${gCols(a)} < ${G(a)}").mkString(" AND ")}
        AND $paritySql)
    SELECT $gs, $ps, arg_max(gid, prio) AS gid
    FROM cand GROUP BY $gs, $ps
    HAVING $interiorSql"""
  }

  private lazy val zarr3dDir: String = graft.TempDirs.create("graft_zarr3d")

  /** The 3D volume through the DSv2 relational scan: |u1 dtype (labels fit
    * a byte), a gz == 1 slab pushed down to chunk pruning (12 of 36 chunk
    * files opened), aggregated under the 3D pixel oracle — gates the
    * source's dimension-generic path end-to-end.
    */
  def zarrDsv23d(s: SparkSession, d: String): DataFrame = {
    val spec = graft.tiles.GridSpec(
      Array(G(0).toLong * L3, G(1).toLong * L3, G(2).toLong * L3),
      Array(L3, L3, L3))
    graft.sources.ZarrIO.write(tiles3(s, d), spec, zarr3dDir, "|u1", "zlib")
    s.read.format("zarr").load(zarr3dDir)
      .filter(col("g0") === 1 && col("value") =!= 0)
      .select(col("g1").as("gy"), col("g2").as("gx"), col("value"))
      .groupBy("gy", "gx")
      .agg(count(lit(1)).as("n_px"), sum("value").as("sum_label"))
  }

  private val ZARR_DSV2_3D_SQL: String = PIXELS3_SQL + """
    SELECT gy, gx, count(*) AS n_px, CAST(sum(label) AS BIGINT) AS sum_label
    FROM lab WHERE gz = 1 GROUP BY gy, gx"""

  private lazy val zarrBoxDir: String = graft.TempDirs.create("graft_zarr3bx")

  /** A PLAIN 3-axis box filter over the SHARDED 3-D tile store, pruned at
    * plan time by the source's own filter pushdown — the tile-grid twin
    * of the parquet Hilbert path (`lo_hscan3_auto`): there the store
    * needs a curve index + injected range cover to win min/max skipping;
    * here the grid coordinates ARE the chunk keys, so the DSv2 scan
    * prunes the box EXACTLY (`ZarrScanBuilder.pushFilters` →
    * `ZarrScan.planInputPartitions`), planning only the 2x2x2 = 8 inner
    * chunks of the 36-chunk grid — ranged-read via shard indexes out of
    * just the 4 shard objects (of 8) the box intersects, the other 4
    * never opened. Both plan facts are guarded in-query:
    * the physical plan must carry all three pushed bounds, and the
    * pruned scan must plan exactly the box's partitions — a silent
    * pushdown regression cannot pass on row equality alone, since the
    * unpruned scan returns the same rows, just reading 4.5x the chunks.
    * At 100 TB this is the flagship read: a viewport/ROI box over a
    * petapixel volume opens only the shards it intersects.
    */
  def zarrBox3(s: SparkSession, d: String): DataFrame = {
    val spec = graft.tiles.GridSpec(
      Array(G(0).toLong * L3, G(1).toLong * L3, G(2).toLong * L3),
      Array(L3, L3, L3))
    graft.sources.Zarr3IO.writeSharded(tiles3(s, d), spec,
      Array(2 * L3, 2 * L3, 2 * L3), zarrBoxDir, "uint16", gzip = true)
    val scanned = s.read.format("zarr").load(zarrBoxDir)
      .filter(col("g0").between(1L, 2L) && col("g1").between(1L, 2L) &&
        col("g2").between(0L, 1L))
    // plan guard 1: chunk pruning — the box is 8 of 36 grid chunks
    require(scanned.rdd.getNumPartitions == 8,
      s"expected the 2x2x2 box to plan 8 chunk partitions of 36, " +
        s"got ${scanned.rdd.getNumPartitions}")
    val df = scanned.filter(col("value") =!= 0)
      .select(col("g0").as("gz"), col("g1").as("gy"), col("g2").as("gx"),
        col("value"))
      .groupBy("gz", "gy", "gx")
      .agg(count(lit(1)).as("n_px"), sum("value").as("sum_label"))
    // plan guard 2: all three bounds reached the scan (visible in the
    // ZarrScan description), none left as a residual driver-side filter
    val plan = df.queryExecution.executedPlan.toString
    require(plan.contains("g0 in [1, 2]") && plan.contains("g1 in [1, 2]") &&
      plan.contains("g2 in [0, 1]"),
      s"3-axis box bounds not pushed to the zarr scan:\n$plan")
    df
  }

  private val ZARR_BOX_3D_SQL: String = PIXELS3_SQL + """
    SELECT gz, gy, gx, count(*) AS n_px, CAST(sum(label) AS BIGINT) AS sum_label
    FROM lab WHERE gz BETWEEN 1 AND 2 AND gy BETWEEN 1 AND 2
      AND gx BETWEEN 0 AND 1
    GROUP BY gz, gy, gx"""

  /** 3D region properties — px_regionprops' volumetric sibling over the
    * voxel relation: per (tile, label) voxel volume, the 3D bounding box,
    * exact centroid numerators with single-division centroids, and
    * extent (volume over bbox volume — the sphericity proxy a 3D
    * morphology screen sorts by). One hash aggregate; voxels dedup
    * explicitly here because the measurement counts cells, unlike tile
    * assembly whose paint is idempotent.
    */
  def regionProps3(s: SparkSession, d: String): DataFrame =
    pixels3(s, d)
      .select("gz", "gy", "gx", "pz", "py", "px", "label")
      .distinct()
      .groupBy("gz", "gy", "gx", "label")
      .agg(count(lit(1)).as("volume"),
        min("pz").as("z0"), max("pz").as("z1"),
        min("py").as("y0"), max("py").as("y1"),
        min("px").as("x0"), max("px").as("x1"),
        sum("pz").as("sz"), sum("py").as("sy"), sum("px").as("sx"))
      .withColumn("cz", expr("sz / volume"))
      .withColumn("cy", expr("sy / volume"))
      .withColumn("cx", expr("sx / volume"))
      .withColumn("extent", expr(
        "volume / ((z1 - z0 + 1) * (y1 - y0 + 1) * (x1 - x0 + 1))"))

  private val REGIONPROPS3_SQL: String = PIXELS3_SQL + s"""
    SELECT gz, gy, gx, label, count(*) AS volume,
           min(pz) AS z0, max(pz) AS z1, min(py) AS y0, max(py) AS y1,
           min(px) AS x0, max(px) AS x1,
           CAST(sum(pz) AS BIGINT) AS sz, CAST(sum(py) AS BIGINT) AS sy,
           CAST(sum(px) AS BIGINT) AS sx,
           CAST(sum(pz) AS BIGINT) / count(*) AS cz,
           CAST(sum(py) AS BIGINT) / count(*) AS cy,
           CAST(sum(px) AS BIGINT) / count(*) AS cx,
           count(*) / ((max(pz) - min(pz) + 1) * (max(py) - min(py) + 1)
                       * (max(px) - min(px) + 1)) AS extent
    FROM lab GROUP BY gz, gy, gx, label"""

  def all: Seq[Q] = Seq(
    Q("px3_remove", remove3, Some(REMOVE3_SQL)),
    Q("px3_pipeline", pipeline3, Some(PIPELINE3_SQL)),
    Q("px3_zarr_dsv2", zarrDsv23d, Some(ZARR_DSV2_3D_SQL)),
    Q("px3_zarr_box", zarrBox3, Some(ZARR_BOX_3D_SQL)),
    Q("px3_regionprops", regionProps3, Some(REGIONPROPS3_SQL)))
}
