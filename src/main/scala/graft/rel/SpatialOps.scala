package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q.tbl

/** Spatial join: point-in-polygon over a grid-binned candidate join — the
  * relational form of the geometry step that follows contour extraction
  * (reference `relabeling.py` emits polygon annotations; a production
  * pipeline then asks "which measurements fall inside which annotated
  * object"). Cited shape: every spatial engine (Sedona, PostGIS
  * partitioned joins) does exactly bin -> equi-join -> exact test.
  *
  * Exactness strategy: polygons are simple integer diamonds (4 vertices,
  * per-vertex radii) derived from `part` keys by modular formulas BOTH
  * engines evaluate identically; the point-in-polygon test is the
  * crossing-number rule with the division cleared by cross-multiplication,
  * so every comparison is exact int64 arithmetic — no epsilon, no floats.
  *
  * Scale shape: candidates come from ONE equi-join on grid cell (polygons
  * explode to the cells of their bounding box — bounded by the max radius,
  * here <= 2x2 cells; each point hashes to exactly one cell, so a
  * candidate pair arises at most once and needs no dedup). The exact test
  * runs inline on the joined row (whole-stage codegen, no second shuffle,
  * no edge explode). At 100 TB both sides shuffle only on cell id; skewed
  * cells salt like any hot join key.
  */
object SpatialOps {

  private val D = 1024 // coordinate domain (offset +64 keeps all ints > 0)
  private val C = 64 // grid cell size

  /** Shared SQL fragments — Spark SQL and DuckDB differ only in the floor
    * division operator (`div` vs `//`; all operands positive, so Spark's
    * truncating div IS floor).
    */
  private def polySrc = s"""
      SELECT p_partkey AS poly_id,
             64 + (p_partkey * 37) % $D AS cx,
             64 + (p_partkey * 91) % $D AS cy,
             1 + (p_partkey * 13) % 50 AS r1,
             1 + (p_partkey * 29) % 50 AS r2,
             1 + (p_partkey * 53) % 50 AS r3,
             1 + (p_partkey * 71) % 50 AS r4
      FROM part WHERE p_partkey % 3 = 0"""

  private def ptSrc = s"""
      SELECT l_orderkey * 10 + l_linenumber AS pt_id,
             64 + (l_orderkey * 7 + l_linenumber * 131) % $D AS px,
             64 + (l_partkey * 11 + l_suppkey * 17) % $D AS py
      FROM lineitem WHERE l_orderkey % 13 = 0"""

  /** Crossing-number term for one directed edge (x1,y1)->(x2,y2) against
    * point (px,py): the edge spans py's horizontal AND the point is left
    * of the crossing — `px < x1 + (py-y1)(x2-x1)/(y2-y1)` with the
    * division cleared by multiplying through by (y2-y1) (sign-corrected by
    * a second multiply; every edge here has y2 != y1).
    */
  private def crossing(x1: String, y1: String, x2: String, y2: String) =
    s"""(CASE WHEN (($y1 > py) != ($y2 > py))
              AND ((($x1 - px) * (($y2) - ($y1)) + (py - ($y1)) * (($x2) - ($x1)))
                   * (($y2) - ($y1))) > 0
         THEN 1 ELSE 0 END)"""

  /** Diamond vertices: (cx+r1,cy) -> (cx,cy+r2) -> (cx-r3,cy) ->
    * (cx,cy-r4) -> close. Point is inside iff the crossing count is odd.
    */
  private[graft] val INSIDE = "(" +
    crossing("cx + r1", "cy", "cx", "cy + r2") + " + " +
    crossing("cx", "cy + r2", "cx - r3", "cy") + " + " +
    crossing("cx - r3", "cy", "cx", "cy - r4") + " + " +
    crossing("cx", "cy - r4", "cx + r1", "cy") + ") % 2 = 1"

  private lazy val PIP_SQL = s"""
      WITH polys AS ($polySrc),
      pc1 AS (
        SELECT *, unnest(range((cx - r3) // $C, (cx + r1) // $C + 1)) AS xc
        FROM polys),
      pc AS (
        SELECT poly_id, cx, cy, r1, r2, r3, r4,
               xc * 128 + unnest(range((cy - r4) // $C, (cy + r2) // $C + 1))
                 AS cell
        FROM pc1),
      pts AS ($ptSrc)
      SELECT poly_id, pt_id, px, py
      FROM pts JOIN pc
        ON (px // $C) * 128 + (py // $C) = pc.cell
      WHERE $INSIDE"""

  def all: Seq[Q] = Seq(

    Q("geo_pip_join", (s, d) => {
      tbl(s, d, "part").createOrReplaceTempView("part")
      tbl(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(s"""
        WITH polys AS ($polySrc),
        pc AS (
          SELECT poly_id, cx, cy, r1, r2, r3, r4,
                 explode(flatten(transform(
                   sequence((cx - r3) div $C, (cx + r1) div $C),
                   xc -> transform(sequence((cy - r4) div $C, (cy + r2) div $C),
                                   yc -> xc * 128 + yc)))) AS cell
          FROM polys),
        pts AS ($ptSrc)
        SELECT poly_id, pt_id, px, py
        FROM pts JOIN pc
          ON (px div $C) * 128 + (py div $C) = pc.cell
        WHERE $INSIDE""")
    }, Some(PIP_SQL)),

    Q("st_geo_pip", pipStream, Some(PIP_SQL)),

    // Radius (distance) join — "every measurement within R of a site":
    // the other half of the spatial-join pair. Cell size = R, so a
    // qualifying partner can only sit in the probe's 3x3 cell stencil;
    // the probe side replicates to its 9 neighbor cells (bounded fan-out),
    // the build side hashes to its ONE home cell, so each candidate pair
    // arises exactly once — equi-join on cell, then the exact integer
    // dx^2+dy^2 <= R^2 test inline. The same shape serves ANN bucket
    // probing and trajectory matching; at 100 TB both sides shuffle once
    // on cell id.
    Q("geo_radius_join", (s, d) => {
      tbl(s, d, "lineitem").createOrReplaceTempView("lineitem")
      tbl(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(s"""
        WITH pts AS ($ptSrc),
        sites AS ($siteSrc),
        probe AS (
          SELECT pt_id, px, py,
                 explode(flatten(transform(sequence(-1, 1),
                   dx -> transform(sequence(-1, 1),
                     dy -> (px div $R + dx) * 256 + (py div $R + dy)))))
                   AS cell
          FROM pts)
        SELECT pt_id, site_id, px, py,
               (px - sx) * (px - sx) + (py - sy) * (py - sy) AS dist2
        FROM probe JOIN sites
          ON (sx div $R) * 256 + (sy div $R) = probe.cell
        WHERE (px - sx) * (px - sx) + (py - sy) * (py - sy) <= ${R * R}""")
    }, Some(s"""
      WITH pts AS ($ptSrc),
      sites AS ($siteSrc),
      p1 AS (SELECT *, unnest([-1, 0, 1]) AS dx FROM pts),
      probe AS (
        SELECT pt_id, px, py,
               (px // $R + dx) * 256 + (py // $R + unnest([-1, 0, 1])) AS cell
        FROM p1)
      SELECT pt_id, site_id, px, py,
             (px - sx) * (px - sx) + (py - sy) * (py - sy) AS dist2
      FROM probe JOIN sites
        ON (sx // $R) * 256 + (sy // $R) = probe.cell
      WHERE (px - sx) * (px - sx) + (py - sy) * (py - sy) <= ${R * R}""")),

    // Bounded nearest-neighbor spatial join — "which site serves this
    // point": the radius join's 3x3-stencil candidates reduced to each
    // point's argmin by exact integer squared distance (site id breaks
    // ties), emitted only for points with a site within R — the bound
    // that keeps candidate generation an equi-join instead of an
    // unbounded ring search. Partition per point is stencil-bounded, so
    // the rank window never sees more than a cell neighborhood.
    Q("geo_knn_join", (s, d) => {
      tbl(s, d, "lineitem").createOrReplaceTempView("lineitem")
      tbl(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(s"""
        WITH pts AS ($ptSrc),
        sites AS ($siteSrc),
        probe AS (
          SELECT pt_id, px, py,
                 explode(flatten(transform(sequence(-1, 1),
                   dx -> transform(sequence(-1, 1),
                     dy -> (px div $R + dx) * 256 + (py div $R + dy)))))
                   AS cell
          FROM pts),
        cand AS (
          SELECT pt_id, site_id, px, py,
                 (px - sx) * (px - sx) + (py - sy) * (py - sy) AS dist2
          FROM probe JOIN sites
            ON (sx div $R) * 256 + (sy div $R) = probe.cell
          WHERE (px - sx) * (px - sx) + (py - sy) * (py - sy) <= ${R * R})
        SELECT pt_id, site_id, px, py, dist2 FROM (
          SELECT *, row_number() OVER (PARTITION BY pt_id
                      ORDER BY dist2 ASC, site_id ASC) AS rn
          FROM cand) WHERE rn = 1""")
    }, Some(s"""
      WITH pts AS ($ptSrc),
      sites AS ($siteSrc),
      p1 AS (SELECT *, unnest([-1, 0, 1]) AS dx FROM pts),
      probe AS (
        SELECT pt_id, px, py,
               (px // $R + dx) * 256 + (py // $R + unnest([-1, 0, 1])) AS cell
        FROM p1),
      cand AS (
        SELECT pt_id, site_id, px, py,
               (px - sx) * (px - sx) + (py - sy) * (py - sy) AS dist2
        FROM probe JOIN sites
          ON (sx // $R) * 256 + (sy // $R) = probe.cell
        WHERE (px - sx) * (px - sx) + (py - sy) * (py - sy) <= ${R * R})
      SELECT pt_id, site_id, px, py, dist2 FROM (
        SELECT *, row_number() OVER (PARTITION BY pt_id
                    ORDER BY dist2 ASC, site_id ASC) AS rn
        FROM cand) WHERE rn = 1""")))

  /** Streaming twin of geo_pip_join: measurement points ARRIVE as a
    * stream (staged files, several micro-batches) and join the STATIC
    * polygon-cell relation — a stream-static inner join, which Structured
    * Streaming runs stateless and watermark-free (the static side is
    * re-broadcast per batch, the stream side never buffers). The exact
    * inside test is the same shared predicate; output is append-mode and
    * batch-equivalent, gated by the identical oracle as the batch gate.
    */
  private val sinkCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  def pipStream(s: SparkSession, d: String): DataFrame = {
    val inv = sinkCounter.incrementAndGet()
    val qn = s"st_geo_pip_sink_$inv"
    val stageDir = graft.TempDirs.create(s"graft_pip_stage_$inv")
    tbl(s, d, "lineitem")
      .filter(col("l_orderkey") % 13 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"))
      .repartition(4).write.mode("overwrite").parquet(stageDir)
    tbl(s, d, "part").createOrReplaceTempView("part")
    val polyCells = s.sql(s"""
      WITH polys AS ($polySrc)
      SELECT poly_id, cx, cy, r1, r2, r3, r4,
             explode(flatten(transform(
               sequence((cx - r3) div $C, (cx + r1) div $C),
               xc -> transform(sequence((cy - r4) div $C, (cy + r2) div $C),
                               yc -> xc * 128 + yc)))) AS cell
      FROM polys""")
    // the static side is re-evaluated by EVERY micro-batch's incremental
    // plan; persist it so each batch re-broadcasts cached cells instead
    // of re-scanning part + re-exploding the polygon stencils per trigger
    polyCells.persist()
    polyCells.count()
    val pts = s.readStream
      .schema("l_orderkey BIGINT, l_linenumber INT, l_partkey BIGINT, " +
        "l_suppkey BIGINT")
      .option("maxFilesPerTrigger", "1").parquet(stageDir)
      .selectExpr("l_orderkey * 10 + l_linenumber AS pt_id",
        s"64 + (l_orderkey * 7 + l_linenumber * 131) % $D AS px",
        s"64 + (l_partkey * 11 + l_suppkey * 17) % $D AS py")
      .withColumn("cell",
        expr(s"(px div $C) * 128 + (py div $C)"))
    val joined = pts.join(polyCells, "cell")
      .filter(expr(INSIDE))
      .select("poly_id", "pt_id", "px", "py")
    val query = graft.streaming.StateSizing.startSized(s)(
      joined.writeStream.outputMode("append")
        .format("memory").queryName(qn).start())
    try query.processAllAvailable()
    finally {
      query.stop()
      polyCells.unpersist(blocking = false)
    }
    s.table(qn)
  }

  private val R = 16 // join radius = grid cell size

  private def siteSrc = s"""
      SELECT o_orderkey AS site_id,
             64 + (o_orderkey * 19) % $D AS sx,
             64 + (o_orderkey * 43) % $D AS sy
      FROM orders WHERE o_orderkey % 11 = 0"""
}
