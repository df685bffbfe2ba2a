package graft

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Zarr3IO

/** The OME-NGFF group layout behind px_zarr_ome: the group descriptor must
  * be what an external zarr/OME client expects (v3 group node, ome.version,
  * multiscales axes + datasets with 2^level coordinate scales), and each
  * listed level must be an independently-openable v3 array whose content
  * halves in each dimension.
  */
class OmeGroupSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  test("group descriptor is OME-NGFF-shaped and levels open standalone") {
    val dir = TempDirs.create("graft_ome_spec")
    spark.range(64)
      .selectExpr("id div 32 AS g0", "(id div 16) % 2 AS g1",
        "(id div 4) % 4 AS p0", "id % 4 AS p1", "id + 1 AS value")
      .write.format("zarr")
      .option("shape", "8,8").option("chunks", "4,4")
      .option("dtype", "uint16").option("compressor", "gzip")
      .option("zarrFormat", "3").mode("overwrite").save(s"$dir/0")
    spark.range(16)
      .selectExpr("CAST(0 AS BIGINT) AS g0", "CAST(0 AS BIGINT) AS g1",
        "id div 4 AS p0", "id % 4 AS p1", "id + 1 AS value")
      .write.format("zarr")
      .option("shape", "4,4").option("chunks", "4,4")
      .option("dtype", "uint16").option("compressor", "gzip")
      .option("zarrFormat", "3").mode("overwrite").save(s"$dir/1")
    Zarr3IO.writeGroupMeta(dir, Seq("0", "1"))

    // external-client shape: parse the raw JSON, not our reader
    val root = new ObjectMapper().readTree(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "zarr.json")))
    assert(root.path("zarr_format").asInt() === 3)
    assert(root.path("node_type").asText() === "group")
    val ome = root.path("attributes").path("ome")
    assert(ome.path("version").asText() === "0.5")
    val ms = ome.path("multiscales").path(0)
    assert((0 until ms.path("axes").size())
      .map(i => ms.path("axes").get(i).path("name").asText()) === Seq("y", "x"))
    val ds = ms.path("datasets")
    assert((0 until ds.size()).map(i => ds.get(i).path("path").asText())
      === Seq("0", "1"))
    val scale1 = ds.get(1).path("coordinateTransformations").get(0)
    assert(scale1.path("type").asText() === "scale")
    assert(scale1.path("scale").get(0).asDouble() === 2.0)

    // our reader agrees with the raw parse
    assert(Zarr3IO.readGroupLevels(dir) === Seq("0", "1"))

    // each level is an independently-openable v3 array
    val l0 = spark.read.format("zarr").load(s"$dir/0")
    val l1 = spark.read.format("zarr").load(s"$dir/1")
    assert(l0.agg(count(lit(1)), sum("value")).collect()(0).toSeq
      === Seq(64L, (1L to 64L).sum))
    assert(l1.agg(count(lit(1)), sum("value")).collect()(0).toSeq
      === Seq(16L, (1L to 16L).sum))
  }
}
