package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.long_dot

class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session

  test("long_dot matches aggregate/zip_with composition (codegen + eval)") {
    import spark.implicits._
    val df = spark.range(100).select(
      expr("transform(sequence(0, 63), i -> (id * 31 + i * 17) % 1000 - 500)").as("qv"),
      expr("transform(sequence(0, 63), i -> (id * 13 + i * 29) % 1000 - 500)").as("wv"))
    val got = df.select(
      long_dot(col("qv"), col("wv")).as("native"),
      expr("aggregate(zip_with(qv, wv, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
        .as("composed")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("long_dot null propagation and type check") {
    import spark.implicits._
    val df = Seq((Array(1L, 2L), Option(Array(3L, 4L))), (Array(1L, 2L), None))
      .toDF("a", "b")
    val rows = df.select(long_dot(col("a"), col("b")).as("d")).collect()
    assert(rows(0).getLong(0) == 11L)
    assert(rows(1).isNullAt(0))
    intercept[Exception] {
      df.select(long_dot(col("a"), lit("nope"))).collect()
    }
  }

  test("GraftFunctions.register exposes long_dot to SQL") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT long_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").collect()
    assert(r(0).getLong(0) == 32L)
    intercept[Exception] {
      spark.sql("SELECT long_dot(array(1L))").collect()
    }
  }

  test("pq_encode_word rejects mis-sized inputs instead of packing garbage") {
    import spark.implicits._
    import graft.functions.VectorFunctions.pq_encode_word
    def book(n: Int) = typedLit((0 until n).map(_.toLong))
    val ok = Seq(Tuple1((0 until 16).map(_.toLong).toArray)).toDF("v")
      .select(pq_encode_word(col("v"), book(2 * 4 * 8),
        subspaces = 2, centroids = 4, subDim = 8))
    assert(ok.collect().length == 1)
    // short vector: 15 elements where subspaces*subDim = 16
    val shortVec = Seq(Tuple1((0 until 15).map(_.toLong).toArray)).toDF("v")
      .select(pq_encode_word(col("v"), book(2 * 4 * 8),
        subspaces = 2, centroids = 4, subDim = 8))
    val e1 = intercept[Exception] { shortVec.collect() }
    assert(e1.getMessage.contains("pq_encode_word") ||
      e1.getCause != null && e1.getCause.getMessage.contains("pq_encode_word"))
    // mis-sized codebook: 63 elements where subspaces*centroids*subDim = 64
    val shortBook = Seq(Tuple1((0 until 16).map(_.toLong).toArray)).toDF("v")
      .select(pq_encode_word(col("v"), book(63),
        subspaces = 2, centroids = 4, subDim = 8))
    val e2 = intercept[Exception] { shortBook.collect() }
    assert(e2.getMessage.contains("pq_encode_word") ||
      e2.getCause != null && e2.getCause.getMessage.contains("pq_encode_word"))
    // >16 subspaces cannot pack into one 64-bit word
    intercept[IllegalArgumentException] {
      pq_encode_word(col("v"), book(17 * 16 * 1),
        subspaces = 17, centroids = 16, subDim = 1)
    }
  }

  test("float_dot widens per element and accumulates in order (codegen + eval)") {
    import spark.implicits._
    import graft.functions.VectorFunctions.float_dot
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(50)((Array.fill(64)(rnd.nextFloat() - 0.5f),
      Array.fill(64)(rnd.nextFloat() - 0.5f)))
    val df = rows.toDF("a", "b")
    val got = df.select(float_dot(col("a"), col("b")).as("d")).collect()
    rows.zip(got).foreach { case ((a, b), r) =>
      var acc = 0.0
      var i = 0
      while (i < 64) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(acc)) // bit-exact, not approx
    }
    intercept[Exception] {
      df.select(float_dot(col("a"), lit(1.0))).collect()
    }
  }

  test("ann_recall is bounded by its own candidate count and by k") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("ann_recall")(spark, "/root/testdata/sf0.001")
      .cache()
    try {
      assert(df.count() > 0)
      assert(df.filter(col("hits") > col("n_ivf")).count() == 0)
      assert(df.filter(col("hits") > 10 || col("n_ivf") > 10).count() == 0)
      assert(df.filter(col("hits") < 0).count() == 0)
      // the index finds SOMETHING across the stratum (recall > 0 overall)
      assert(df.agg(sum("hits")).collect()(0).getLong(0) > 0)
    } finally df.unpersist()
  }

  test("multi-probe IVF dominates single-probe recall") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    def total(q: String) = SparkEntry.queries(q)(spark, sf)
      .agg(sum("hits"), sum("n_ivf")).collect()(0)
    val p1 = total("ann_recall"); val p2 = total("ann_recall_probe2")
    // probe-2 candidate lists are supersets per query, so both hits and
    // candidate counts can only grow
    assert(p2.getLong(0) >= p1.getLong(0),
      s"probe2 hits ${p2.getLong(0)} < probe1 ${p1.getLong(0)}")
    assert(p2.getLong(1) >= p1.getLong(1))
  }
}
