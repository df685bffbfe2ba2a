package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import graft.geojson.Annotate
import graft.ops.{CCLSegmentation, Relabel}
import graft.tiles.GridSpec

/** O5/O6 golden tests against `ann_2d.npz` (converted to canonical JSON in
  * test resources): contour tracing must reproduce OpenCV point order
  * bit-for-bit; compositions `labels2geojson` / `image2geojson` must land on
  * the same annotations from core-sized and raw inputs respectively.
  */
class AnnotateGoldenSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val mapper = new ObjectMapper()
  private val ov = Array(2, 2)
  private val spec = GridSpec(Array(16L, 12L), Array(4, 4))

  private lazy val golden: Map[String, String] = {
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(getClass.getResource("/ann_2d.json").toURI)))
    val node = mapper.readTree(raw)
    import scala.jdk.CollectionConverters._
    node.properties().asScala.map { e =>
      e.getKey -> (if (e.getValue.isNull) null else e.getValue.toString)
    }.toMap
  }

  private def assertMatchesGolden(got: Seq[Annotate.TileAnnotation]): Unit = {
    assert(got.map(_.locKey).toSet == golden.keySet)
    for (a <- got) {
      val want = golden(a.locKey)
      if (want == null)
        assert(a.geojson == null, s"tile ${a.locKey}: expected empty, got ${a.geojson}")
      else {
        assert(a.geojson != null, s"tile ${a.locKey}: expected features, got null")
        assert(mapper.readTree(a.geojson) == mapper.readTree(want),
          s"tile ${a.locKey}:\ngot  ${a.geojson}\nwant $want")
      }
    }
  }

  test("annotate_labeled_tiles matches ann_2d") {
    val in = Goldens.tiles(spark, "rem_2d", Goldens.grid2d)
    val got = Annotate.annotateLabeledTiles(in, ov).collect().toSeq
    assertMatchesGolden(got)
  }

  test("annotate with classes channel matches ann_2d") {
    val in = Goldens.tiles(spark, "rem_2d", Goldens.grid2d, withClasses = true)
    val got = Annotate.annotateLabeledTiles(in, ov, Some(Map(1L -> "cell")))
      .collect().toSeq
    assertMatchesGolden(got)
  }

  test("labels2geojson from core tiles matches ann_2d") {
    val in = Goldens.tiles(spark, "trim_2d", Goldens.grid2d)
    val got = Relabel.labels2geojson(in, spec, ov, threshold = 0.25)
      .collect().toSeq
    assertMatchesGolden(got)
  }

  test("image2geojson end-to-end matches ann_2d") {
    val in = Goldens.tiles(spark, "input_2d", Goldens.grid2d)
    val got = Relabel.image2geojson(in, spec, CCLSegmentation(), ov,
      threshold = 0.25).collect().toSeq
    assertMatchesGolden(got)
  }

  test("zip sink writes one member per non-empty tile") {
    val in = Goldens.tiles(spark, "rem_2d", Goldens.grid2d)
    val ann = Annotate.annotateLabeledTiles(in, ov)
    val out = java.nio.file.Files.createTempDirectory("graft-zip")
      .resolve("annotations.zip")
    Annotate.zipAnnotations(ann, out)
    val zf = new java.util.zip.ZipFile(out.toFile)
    try {
      import scala.jdk.CollectionConverters._
      val names = zf.entries().asScala.map(_.getName).toSet
      val expected = golden.collect { case (k, v) if v != null => s"$k.geojson" }.toSet
      assert(names == expected)
      // round-trip one member
      val e = zf.getEntry(expected.head)
      val body = new String(zf.getInputStream(e).readAllBytes(), "UTF-8")
      assert(mapper.readTree(body) ==
        mapper.readTree(golden(expected.head.stripSuffix(".geojson"))))
    } finally zf.close()
  }

  test("annotation dir sink writes through a non-default Hadoop scheme") {
    // the 100 TB deployment's sink target is HDFS/an object store, not a
    // POSIX mount: drive the executor-side writer through the test-only
    // `cfs:` Hadoop filesystem (the exact code path an `s3a://` URI takes
    // — scheme resolution on the driver, per-file creates from executors
    // via the serialized Hadoop conf) and golden-check what landed
    spark.sparkContext.hadoopConfiguration
      .set("fs.cfs.impl", "graft.CountingFileSystem")
    val backing = java.nio.file.Files.createTempDirectory("graft-anncfs")
    val in = Goldens.tiles(spark, "rem_2d", Goldens.grid2d)
    val ann = Annotate.annotateLabeledTiles(in, ov)
    val n = Annotate.writeAnnotationDir(ann, "cfs:" + backing.toAbsolutePath)
    val files = backing.toFile.listFiles()
      .map(_.getName).filterNot(_.endsWith(".crc")).toSet
    val expected = golden.collect { case (k, v) if v != null => s"$k.geojson" }.toSet
    assert(n == expected.size && files == expected,
      s"cfs sink wrote $files, expected $expected")
    for (f <- files) {
      val body = new String(
        java.nio.file.Files.readAllBytes(backing.resolve(f)), "UTF-8")
      assert(mapper.readTree(body) ==
        mapper.readTree(golden(f.stripSuffix(".geojson"))))
    }
  }

  test("zip sink writes through a non-default Hadoop scheme; empty is a no-op row count") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.cfs.impl", "graft.CountingFileSystem")
    val backing = java.nio.file.Files.createTempDirectory("graft-zipcfs")
    val in = Goldens.tiles(spark, "rem_2d", Goldens.grid2d)
    val ann = Annotate.annotateLabeledTiles(in, ov)
    Annotate.zipAnnotations(ann, "cfs:" + backing.resolve("a.zip"))
    val zf = new java.util.zip.ZipFile(backing.resolve("a.zip").toFile)
    try {
      import scala.jdk.CollectionConverters._
      val names = zf.entries().asScala.map(_.getName).toSet
      val expected = golden.collect { case (k, v) if v != null => s"$k.geojson" }.toSet
      assert(names == expected, "cfs zip members must match the golden set")
    } finally zf.close()
    // and the dir sink on an EMPTY dataset: directory created, 0 written
    import spark.implicits._
    val empty = spark.emptyDataset[Annotate.TileAnnotation]
    val emptyDir = backing.resolve("empty")
    assert(Annotate.writeAnnotationDir(empty,
      "cfs:" + emptyDir.toAbsolutePath) == 0L)
    assert(java.nio.file.Files.isDirectory(emptyDir) &&
      emptyDir.toFile.listFiles().isEmpty)
  }

  test("executor-side annotation dir matches the zip members") {
    val in = Goldens.tiles(spark, "rem_2d", Goldens.grid2d)
    val ann = Annotate.annotateLabeledTiles(in, ov)
    val dir = java.nio.file.Files.createTempDirectory("graft-anndir")
    val n = Annotate.writeAnnotationDir(ann, dir)
    // hidden `.crc` siblings are local-ChecksumFileSystem metadata
    val files = dir.toFile.listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSet
    val expected = golden.collect { case (k, v) if v != null => s"$k.geojson" }.toSet
    assert(n == expected.size && files == expected)
    for (f <- files) {
      val body = new String(java.nio.file.Files.readAllBytes(dir.resolve(f)), "UTF-8")
      assert(mapper.readTree(body) ==
        mapper.readTree(golden(f.stripSuffix(".geojson"))))
    }
  }
}
