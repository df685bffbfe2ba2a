package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the corpus-curation operators (rel/CurationOps). The
  * hash-vs-DuckDB gate is the driver's; these pin the invariants that make
  * the operators usable in a pipeline.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("dd_canonical elects exactly one canonical per component") {
    val df = q("dd_canonical").cache()
    try {
      val perComp = df.groupBy("comp")
        .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("kept_n"),
          countDistinct("canonical").as("canon_n"))
      assert(perComp.filter(col("kept_n") =!= 1L || col("canon_n") =!= 1L)
        .count() == 0)
      // the canonical is a member of its own component with maximal length
      val bad = df.as("a").join(df.as("b"),
          col("a.comp") === col("b.comp") &&
            col("b.doc_id") === col("a.canonical"))
        .filter(col("a.len") > col("b.len"))
      assert(bad.count() == 0)
    } finally df.unpersist()
  }

  test("tx_sample_split is deterministic and splits roughly 90/5/5") {
    val one = q("tx_sample_split").collect().toSet
    val two = q("tx_sample_split").collect().toSet
    assert(one == two)
    val bySplit = q("tx_sample_split").groupBy("split")
      .agg(sum("n_docs").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = bySplit.values.sum.toDouble
    assert(bySplit("train") / total > 0.8)
    assert(bySplit.getOrElse("val", 0L) / total < 0.15)
    assert(bySplit.getOrElse("test", 0L) / total < 0.15)
  }

  test("tx_ngrams returns a descending unique top-20") {
    val rows = q("tx_ngrams").collect()
    assert(rows.length == 20)
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getString(0)).distinct.length == 20)
  }

  test("tx_tfidf emits at most 3 ranked terms per doc, ratio consistent") {
    val df = q("tx_tfidf").cache()
    try {
      assert(df.groupBy("doc_id").count().filter(col("count") > 3).count() == 0)
      assert(df.filter(col("rn") < 1 || col("rn") > 3).count() == 0)
      // tfnidf == tf * N / df exactly (N = corpus row count)
      val n = spark.read.parquet(s"$sf/documents.parquet").count()
      val bad = df.filter(
        col("tfnidf") =!= (col("tf") * n).cast("double") / col("df").cast("double"))
      assert(bad.count() == 0)
    } finally df.unpersist()
  }
}
