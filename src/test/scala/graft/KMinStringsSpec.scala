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
}
