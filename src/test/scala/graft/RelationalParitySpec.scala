package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.rel.{PipelineOps, RelabelRel}

/** Differential test: the tile-form kernels (remove/merge through the real
  * halo-exchange shuffle) must agree pixel-for-pixel with the relational
  * formulation (pure Catalyst joins/aggregates) on the synthetic grid —
  * two independent implementations of the same semantics.
  */
class RelationalParitySpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("tile remove kernel == relational remove") {
    val tile = rows(PipelineOps.removePixels(spark, sf))
    val rel = rows(
      RelabelRel.pixels(spark, sf)
        .join(RelabelRel.remove(spark, sf), Seq("gy", "gx", "label"))
        .select("gy", "gx", "py", "px", "gid"))
    assert(tile == rel, {
      val onlyTile = tile -- rel; val onlyRel = rel -- tile
      s"only-tile: ${onlyTile.take(5)}\nonly-rel: ${onlyRel.take(5)}"
    })
  }

  test("tile merge pipeline == relational merge") {
    val tile = rows(PipelineOps.pipeline(spark, sf))
    val rel = rows(RelabelRel.merge(spark, sf))
    assert(tile == rel, {
      val onlyTile = tile -- rel; val onlyRel = rel -- tile
      s"only-tile: ${onlyTile.take(5)}\nonly-rel: ${onlyRel.take(5)}"
    })
  }
}
