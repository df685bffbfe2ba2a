package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.HInterval
import graft.plans.GraftLayout

/** The durable layout declaration: write-side helper drops the
  * `_graft_layout.json` sidecar next to the hilbert-sorted store, the
  * read-side helper installs the layout into the session so a plain box
  * filter gets the range injection with no manual conf — and every
  * failure mode (no sidecar, malformed sidecar, hostile names) degrades
  * to a plain parquet read with nothing declared.
  */
class GraftLayoutSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"
  private val ConfKey = "spark.graft.hilbert.layout"

  private def fresh[T](body: => T): T = {
    val prior = spark.conf.getOption(ConfKey)
    spark.conf.unset(ConfKey)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(ConfKey, v)
      case None => spark.conf.unset(ConfKey)
    }
  }

  private def src = spark.read.parquet(s"$sf/lineitem.parquet")
    .select(expr("l_orderkey & 65535").as("gx"),
      expr("l_partkey & 65535").as("gy"),
      expr("l_suppkey & 1023").as("gz"))

  private def coverRanges(df: org.apache.spark.sql.DataFrame,
      hName: String): Int =
    df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
            a: org.apache.spark.sql.catalyst.expressions.AttributeReference,
            org.apache.spark.sql.catalyst.expressions.Literal(_, _))
            if a.name == hName => 1
        }.size
    }.sum

  test("write + read round-trip declares the 2-D layout automatically") {
    fresh {
      val dir = TempDirs.create("glayout2")
      GraftLayout.writeHilbert(src, dir, "gx", "gy", "gh", 8)
      // the store is ordinary parquet for any reader (sidecar hidden)
      val plainRows = spark.read.parquet(dir)
        .filter(col("gx").between(100L, 900L) && col("gy").between(20L, 150L))
        .collect().map(_.toSeq).toSet
      assert(plainRows.nonEmpty)
      val df = GraftLayout.read(spark, dir)
        .filter(col("gx").between(100L, 900L) && col("gy").between(20L, 150L))
      assert(spark.conf.get(ConfKey) == "gx,gy,gh")
      assert(coverRanges(df, "gh") ==
        HInterval.cover(100L, 900L, 20L, 150L).size,
        "plain box filter gets the injected cover")
      assert(df.collect().map(_.toSeq).toSet == plainRows)
    }
  }

  test("3-D write + read; layouts accumulate deduplicated") {
    fresh {
      val d2 = TempDirs.create("glayout2b")
      val d3 = TempDirs.create("glayout3")
      GraftLayout.writeHilbert(src, d2, "gx", "gy", "gh", 4)
      GraftLayout.writeHilbert3(src, d3, "gx", "gy", "gz", "gh3", 4)
      GraftLayout.read(spark, d2)
      GraftLayout.read(spark, d3)
      GraftLayout.read(spark, d3) // repeat: no duplicate entry
      assert(spark.conf.get(ConfKey) == "gx,gy,gh;gx,gy,gz,gh3")
      val df3 = GraftLayout.read(spark, d3)
        .filter(col("gx").between(100L, 400L) &&
          col("gy").between(20L, 150L) && col("gz").between(2L, 8L))
      assert(coverRanges(df3, "gh3") ==
        HInterval.cover3(100L, 400L, 20L, 150L, 2L, 8L).size)
      assert(df3.count() > 0)
    }
  }

  test("no sidecar: plain read, nothing declared") {
    fresh {
      val dir = TempDirs.create("glayout_plain")
      src.write.mode("overwrite").parquet(dir)
      assert(GraftLayout.read(spark, dir).count() == src.count())
      assert(spark.conf.getOption(ConfKey).isEmpty)
    }
  }

  test("malformed and hostile sidecars fail closed") {
    fresh {
      val dir = TempDirs.create("glayout_bad")
      src.limit(10).write.mode("overwrite").parquet(dir)
      val p = java.nio.file.Paths.get(dir, GraftLayout.SidecarName)
      // malformed JSON
      java.nio.file.Files.writeString(p, "{not json")
      assert(GraftLayout.read(spark, dir).count() == 10)
      assert(spark.conf.getOption(ConfKey).isEmpty)
      // separator injection in a column name must not reach the conf
      java.nio.file.Files.writeString(p,
        """{"columns":["a;b,c","y","h"]}""")
      assert(GraftLayout.read(spark, dir).count() == 10)
      assert(spark.conf.getOption(ConfKey).isEmpty)
      // wrong arity
      java.nio.file.Files.writeString(p, """{"columns":["x","h"]}""")
      assert(GraftLayout.read(spark, dir).count() == 10)
      assert(spark.conf.getOption(ConfKey).isEmpty)
    }
  }
}
