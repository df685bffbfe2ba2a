package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tiles.Tile

/** Direct driver gates for the O5 annotate kernel (`chunkops.py:192-231`,
  * `utils.py:146-188`) — the 2D kernel and its beyond-reference per-plane 3D
  * extension — each hash-checked against a DuckDB oracle.
  *
  * The input is the post-`prepare_input` geometry the kernel is specified
  * against: tiles already expanded by the halo (low/high edges clipped at the
  * image border), densely labeled from 5x5(x5) global blocks. 5 divides
  * neither chunk edge, so every tile sees clipped fragments whose offsets
  * exercise the kernel's `loc * core - overlap` translation. Each fragment is
  * the intersection of a global box with the tile window — a filled
  * rectangle — so the traced ring is SQL-reconstructible exactly:
  *
  *   - ring bbox  == fragment pixel bbox (in global coordinates);
  *   - ring length (incl. the closing point, `utils.py:178`) follows the
  *     border-following count for filled rectangles: `2*(bh+bw)-3` when both
  *     edges are >= 2, `2*m-1` for a 1-pixel-thin run of length m (the trace
  *     walks out and back), and single pixels are dropped by the kernel's
  *     degenerate-contour rule (< 2 points);
  *   - `properties.objectType` is the default class map's "cell"
  *     (`relabeling.py:106-109`).
  *
  * Unlike [[GeoRel]] (the O1->O3->O5 composition), nothing here is removed or
  * merged: every fragment of every label is annotated, gating the kernel's
  * own geometry — offsets, contour trace, JSON serialization — in isolation.
  */
object AnnotateRel {

  import RelabelRel.{GY, GX, L, OV}
  import Relabel3Rel.{G, L3, OV3}

  /** Global block edge; must not divide the chunk edges (12, 8). */
  private val B = 5
  private val NBX = (GX * L + B - 1) / B
  // 3D block grid extents (z fastest-varying last): 24 x 32 x 24 image
  private val NBY3 = (G(1) * L3 + B - 1) / B
  private val NBX3 = (G(2) * L3 + B - 1) / B

  private def lowHigh(g: Int, gmax: Int, ov: Int): (Int, Int) =
    (if (g > 0) ov else 0, if (g < gmax) ov else 0)

  /** Post-prepare 2D tiles: shape = chunk + present halos, dense labels. */
  private def expandedTiles(s: SparkSession) = {
    import s.implicits._
    s.range(GY.toLong * GX).map { k =>
      val gy = (k / GX).toInt; val gx = (k % GX).toInt
      val (lowY, highY) = lowHigh(gy, GY - 1, OV)
      val (lowX, highX) = lowHigh(gx, GX - 1, OV)
      val h = L + lowY + highY; val w = L + lowX + highX
      val data = new Array[Long](h * w)
      var i = 0
      while (i < data.length) {
        val yg = gy * L - lowY + i / w
        val xg = gx * L - lowX + i % w
        data(i) = (yg / B).toLong * NBX + xg / B + 1
        i += 1
      }
      Tile(Array(gy, gx), Array(GY, GX), Array(h, w), data)
    }
  }

  /** Post-prepare 3D tiles over the [[Relabel3Rel]] grid, 5^3 block labels. */
  private def expandedTiles3(s: SparkSession) = {
    import s.implicits._
    s.range(G(0).toLong * G(1) * G(2)).map { k =>
      val gz = (k / (G(1) * G(2))).toInt
      val gy = ((k / G(2)) % G(1)).toInt
      val gx = (k % G(2)).toInt
      val (lowZ, highZ) = lowHigh(gz, G(0) - 1, OV3)
      val (lowY, highY) = lowHigh(gy, G(1) - 1, OV3)
      val (lowX, highX) = lowHigh(gx, G(2) - 1, OV3)
      val d = L3 + lowZ + highZ; val h = L3 + lowY + highY; val w = L3 + lowX + highX
      val data = new Array[Long](d * h * w)
      var i = 0
      while (i < data.length) {
        val zg = gz * L3 - lowZ + i / (h * w)
        val yg = gy * L3 - lowY + (i / w) % h
        val xg = gx * L3 - lowX + i % w
        data(i) = ((zg / B).toLong * NBY3 + yg / B) * NBX3 + xg / B + 1
        i += 1
      }
      Tile(Array(gz, gy, gx), G.clone(), Array(d, h, w), data)
    }
  }

  /** Feature parse-back shared by both gates: ring bbox in global pixel
    * coordinates, ring point count, and the serialized objectType — all
    * recomputed FROM the JSON string the kernel emitted.
    */
  private val FEATURES_DDL =
    "features ARRAY<STRUCT<geometry: STRUCT<coordinates: ARRAY<ARRAY<ARRAY<BIGINT>>>>, " +
      "properties: STRUCT<objectType: STRING>>>"

  private def parseFeatures(ann: DataFrame, keyCols: Seq[(String, Int)]): DataFrame = {
    val keys = keyCols.map { case (name, idx) =>
      split(col("loc_key"), "-").getItem(idx).cast("long").as(name)
    }
    val kept = keyCols.map { case (name, _) => col(name) }
    ann
      .select(keys :+ col("plane") :+
        explode(from_json(col("geojson"),
          org.apache.spark.sql.types.StructType.fromDDL(FEATURES_DDL))
          .getField("features")).as("f"): _*)
      .select(kept :+ col("plane") :+
        col("f.geometry.coordinates").getItem(0).as("ring") :+
        col("f.properties.objectType").as("object_type"): _*)
      .select(kept :+ col("plane") :+ col("object_type") :+
        array_min(expr("transform(ring, p -> p[0])")).as("min_x") :+
        array_min(expr("transform(ring, p -> p[1])")).as("min_y") :+
        array_max(expr("transform(ring, p -> p[0])")).as("max_x") :+
        array_max(expr("transform(ring, p -> p[1])")).as("max_y") :+
        size(col("ring")).cast("long").as("n_ring"): _*)
  }

  /** O5 direct (2D): annotate the expanded dense tiles, parse every feature
    * back to integer facts. `plane` is constant -1 so the 2D and 3D gates
    * share one parse-back.
    */
  def annotateGate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ann = graft.geojson.Annotate
      .annotateLabeledTiles(expandedTiles(s), Array(OV, OV))
      .filter(_.geojson != null)
      .toDF("loc_key", "geojson")
      .withColumn("plane", lit(-1L))
    parseFeatures(ann, Seq("gy" -> 0, "gx" -> 1)).drop("plane")
  }

  /** Beyond-reference 3D: per-plane FeatureCollections from the 3D kernel. */
  def annotate3Gate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ann = graft.geojson.Annotate
      .annotateLabeledTiles3d(expandedTiles3(s), Array(OV3, OV3, OV3))
      .toDF("loc_key", "plane", "geojson")
    parseFeatures(ann, Seq("gz" -> 0, "gy" -> 1, "gx" -> 2))
  }

  // ---- SQL reconstruction --------------------------------------------------

  /** Ring point count of a filled-rectangle fragment (verified against the
    * tracer: 2(bh+bw)-4 for bh,bw >= 2; 2m-2 thin; +1 closing point).
    */
  private val N_RING_SQL = """
    CAST(CASE WHEN max_y = min_y THEN 2 * (max_x - min_x + 1) - 1
              WHEN max_x = min_x THEN 2 * (max_y - min_y + 1) - 1
              ELSE 2 * ((max_y - min_y) + (max_x - min_x) + 2) - 3
         END AS BIGINT) AS n_ring"""

  private def lowSql(g: String, ov: Int) = s"(CASE WHEN $g > 0 THEN $ov ELSE 0 END)"
  private def extSql(g: String, gmax: Int, l: Int, ov: Int) =
    s"$l + ${lowSql(g, ov)} + (CASE WHEN $g < $gmax THEN $ov ELSE 0 END)"

  val SQL: String = s"""
    WITH grid AS (
      SELECT ty.y AS gy, tx.x AS gx
      FROM range(0, $GY) ty(y), range(0, $GX) tx(x)),
    epix AS (
      SELECT g.gy, g.gx,
             g.gy * $L + py.e - ${lowSql("g.gy", OV)} AS yg,
             g.gx * $L + px.e - ${lowSql("g.gx", OV)} AS xg
      FROM grid g, range(0, ${L + 2 * OV}) py(e), range(0, ${L + 2 * OV}) px(e)
      WHERE py.e < ${extSql("g.gy", GY - 1, L, OV)}
        AND px.e < ${extSql("g.gx", GX - 1, L, OV)}),
    frag AS (
      SELECT gy, gx, (yg // $B) * $NBX + xg // $B + 1 AS label,
             min(xg) AS min_x, min(yg) AS min_y,
             max(xg) AS max_x, max(yg) AS max_y
      FROM epix GROUP BY 1, 2, 3
      HAVING NOT (min(xg) = max(xg) AND min(yg) = max(yg)))
    SELECT gy, gx, 'cell' AS object_type, min_x, min_y, max_x, max_y, $N_RING_SQL
    FROM frag"""

  val SQL3: String = s"""
    WITH grid AS (
      SELECT tz.z AS gz, ty.y AS gy, tx.x AS gx
      FROM range(0, ${G(0)}) tz(z), range(0, ${G(1)}) ty(y), range(0, ${G(2)}) tx(x)),
    epix AS (
      SELECT g.gz, g.gy, g.gx,
             g.gz * $L3 + pz.e - ${lowSql("g.gz", OV3)} AS zg,
             g.gy * $L3 + py.e - ${lowSql("g.gy", OV3)} AS yg,
             g.gx * $L3 + px.e - ${lowSql("g.gx", OV3)} AS xg
      FROM grid g, range(0, ${L3 + 2 * OV3}) pz(e),
           range(0, ${L3 + 2 * OV3}) py(e), range(0, ${L3 + 2 * OV3}) px(e)
      WHERE pz.e < ${extSql("g.gz", G(0) - 1, L3, OV3)}
        AND py.e < ${extSql("g.gy", G(1) - 1, L3, OV3)}
        AND px.e < ${extSql("g.gx", G(2) - 1, L3, OV3)}),
    frag AS (
      SELECT gz, gy, gx, zg AS plane,
             ((zg // $B) * $NBY3 + yg // $B) * $NBX3 + xg // $B + 1 AS label,
             min(xg) AS min_x, min(yg) AS min_y,
             max(xg) AS max_x, max(yg) AS max_y
      FROM epix GROUP BY 1, 2, 3, 4, 5
      HAVING NOT (min(xg) = max(xg) AND min(yg) = max(yg)))
    SELECT gz, gy, gx, plane, 'cell' AS object_type,
           min_x, min_y, max_x, max_y, $N_RING_SQL
    FROM frag"""

  def all: Seq[Q] = Seq(
    Q("geo_annotate", annotateGate, Some(SQL)),
    Q("geo_annotate3d", annotate3Gate, Some(SQL3)))
}
