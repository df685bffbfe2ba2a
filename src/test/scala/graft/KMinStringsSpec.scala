package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.KMinStrings

class KMinStringsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session

  test("k smallest distinct strings, deterministic across partitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(5000)(("g" + rnd.nextInt(3), "v%04d".format(rnd.nextInt(400))))
    def run(parts: Int) =
      rows.toDF("g", "v").repartition(parts)
        .groupBy("g").agg(KMinStrings(col("v"), 16).as("kmin"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val one = run(1)
    val many = run(13)
    assert(one == many) // partial/merge/serialize path == single-buffer path
    for ((g, kmin) <- one) {
      val expect = rows.filter(_._1 == g).map(_._2).distinct.sorted.take(16)
      assert(kmin.toSeq == expect, g)
    }
  }

  test("groups smaller than k return the full distinct set") {
    import spark.implicits._
    val got = Seq(("a", "x"), ("a", "x"), ("a", "y")).toDF("g", "v")
      .groupBy("g").agg(KMinStrings(col("v"), 8).as("kmin"))
      .collect().head.getSeq[String](1)
    assert(got.toSeq == Seq("x", "y"))
  }

  test("nulls are ignored; all-null group yields an empty array") {
    import spark.implicits._
    val got = Seq(("a", Option("x")), ("a", None), ("b", None))
      .toDF("g", "v")
      .groupBy("g").agg(KMinStrings(col("v"), 4).as("kmin"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(got == Map("a" -> Seq("x"), "b" -> Seq()))
  }

  test("SQL registration via extensions-style builder") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    org.apache.spark.sql.graft.Bridge.registerFunction(spark, "kmin_strings", {
      children =>
        KMinStrings(children.head,
          children(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
            .value.asInstanceOf[Int])
    })
    Seq(("a", "q"), ("a", "p")).toDF("g", "v").createOrReplaceTempView("kmv_t")
    val got = spark.sql("SELECT g, kmin_strings(v, 2) AS m FROM kmv_t GROUP BY g")
      .collect().head.getSeq[String](1)
    assert(got.toSeq == Seq("p", "q"))
  }

  test("sk_kmv_overlap: sketch-union == sketch-of-union, estimator ordered") {
    val sf = "/root/testdata/sf0.001"
    val ov = SparkEntry.queries("sk_kmv_overlap")(spark, sf).cache()
    try {
      // the KMV closure property end-to-end: merging the two period
      // sketches and re-truncating to k must land on exactly the kth hash
      // the unsplit corpus sketch (sk_kmv_users) computes
      val users = SparkEntry.queries("sk_kmv_users")(spark, sf)
        .select(col("event_type"), col("kth_hash"))
      assert(ov.join(users, "event_type")
        .filter(col("union_kth") =!= col("kth_hash")).count() == 0,
        "union sketch must equal the sketch of the union")
      assert(ov.filter(col("k_shared") < 0 || col("k_shared") > 8).count() == 0)
      // est_union >= the exact distinct count can't be pinned (it's an
      // estimate), but it must be positive whenever the kth hash exists
      assert(ov.filter(col("union_kth").isNotNull && col("est_union") <= 0)
        .count() == 0)
    } finally ov.unpersist()
  }

  test("sk_kmv_diff: a-only/b-only/shared partition the union sample") {
    val sf = "/root/testdata/sf0.001"
    val diff = SparkEntry.queries("sk_kmv_diff")(spark, sf)
      .withColumnRenamed("union_kth", "d_kth").cache()
    try {
      val ov = SparkEntry.queries("sk_kmv_overlap")(spark, sf)
        .select(col("event_type"), col("union_kth"), col("k_shared"))
      val j = diff.join(ov, "event_type").cache()
      // same sketches → same union threshold, and the three membership
      // classes tile the union sample exactly (membership is exact below
      // the union threshold — the property the estimator rests on)
      assert(j.filter(not(col("d_kth") <=> col("union_kth"))).count() == 0)
      assert(j.filter(col("d_kth").isNotNull &&
        col("k_a_only") + col("k_b_only") + col("k_shared") =!= 8).count() == 0,
        "a-only + b-only + shared must cover all k union minima")
      // difference estimates are non-negative and bounded by the union
      assert(diff.filter(col("est_diff_ab") < 0 ||
        col("est_diff_ab") > col("est_union") ||
        col("est_diff_ba") < 0 ||
        col("est_diff_ba") > col("est_union")).count() == 0)
    } finally diff.unpersist()
  }
}
