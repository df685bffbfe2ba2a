package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.ZarrIO
import graft.tiles.{GridSpec, Tile}

/** Storage-partitioned reads: the scan reports KeyGroupedPartitioning over
  * the grid columns, so per-tile groupBys run without an exchange under
  * spark.sql.sources.v2.bucketing.enabled.
  */
class ZarrStoragePartitionSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private lazy val dir: String = {
    import spark.implicits._
    val d = TempDirs.create("graft_storagepart")
    val spec = GridSpec(Array(20L, 15L), Array(5, 5))
    val tiles = for (gy <- 0 until 4; gx <- 0 until 3) yield
      Tile(Array(gy, gx), Array(4, 3), Array(5, 5),
        Array.tabulate(25)(i => (gy * 100 + gx * 10 + i % 7).toLong))
    ZarrIO.write(spark.createDataset(tiles), spec, d, "<i8", "zlib")
    d
  }

  private def withBucketing[T](f: => T): T = {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try f
    finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
  }

  test("per-tile groupBy over the grid key plans no exchange") {
    withBucketing {
      val df = spark.read.format("zarr").load(dir)
        .groupBy("g0", "g1")
        .agg(count(lit(1)).as("n"), sum("value").as("s"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"grid-key aggregate still shuffles:\n$plan")
      val rows = df.collect()
      assert(rows.length == 12)
      assert(rows.forall(_.getLong(2) == 25L))
      val s00 = rows.find(r => r.getLong(0) == 2 && r.getLong(1) == 1).get
      // values 210 + (i % 7) over 25 cells: 3 full cycles of 0..6 + 0,1,2,3
      assert(s00.getLong(3) == 25L * 210 + 3 * 21 + 6)
    }
  }

  test("without the conf the aggregate still answers (with an exchange)") {
    val df = spark.read.format("zarr").load(dir)
      .groupBy("g0", "g1").agg(count(lit(1)).as("n"))
    assert(df.collect().length == 12)
  }

  // second store, same grid geometry, different values — the SPJ partner
  private lazy val dir2: String = {
    import spark.implicits._
    val d = TempDirs.create("graft_storagepart2")
    val spec = GridSpec(Array(20L, 15L), Array(5, 5))
    val tiles = for (gy <- 0 until 4; gx <- 0 until 3) yield
      Tile(Array(gy, gx), Array(4, 3), Array(5, 5),
        Array.tabulate(25)(i => (gy * 7 + gx * 5 + i % 3).toLong))
    ZarrIO.write(spark.createDataset(tiles), spec, d, "<i8", "zlib")
    d
  }

  test("storage-partitioned join of two stores plans no shuffle") {
    withBucketing {
      // force the non-broadcast path: with auto-broadcast on, the pruned-
      // statistics estimate (correctly) broadcasts the small store instead
      // and SPJ never needs to kick in
      val priorThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
      val a = spark.read.format("zarr").load(dir)
        .groupBy("g0", "g1").agg(sum("value").as("sa"))
      val b = spark.read.format("zarr").load(dir2)
        .groupBy("g0", "g1").agg(sum("value").as("sb"))
      val joined = a.join(b, Seq("g0", "g1"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-partitioned stores still shuffled to join:\n$plan")
      val rows = joined.collect()
      assert(rows.length == 12)
      val r = rows.find(r => r.getLong(0) == 1 && r.getLong(1) == 2).get
      // store 1: 120 + i%7 over 25 cells = 25*120 + 3 cycles of 21 + 0+1+2+3
      assert(r.getLong(2) == 25L * 120 + 3 * 21 + 6)
      // store 2: 17 + i%3 over 25 cells = 25*17 + 8 cycles of 3 + 0
      assert(r.getLong(3) == 25L * 17 + 8 * 3)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        priorThresh)
    }
  }

  test("value-only projection reports unknown partitioning (keys pruned)") {
    withBucketing {
      // grouping on a non-key column must still shuffle correctly
      val df = spark.read.format("zarr").load(dir)
        .groupBy("p0").agg(count(lit(1)).as("n"))
      val rows = df.collect()
      assert(rows.length == 5 && rows.forall(_.getLong(1) == 4L * 3 * 5))
    }
  }
}
