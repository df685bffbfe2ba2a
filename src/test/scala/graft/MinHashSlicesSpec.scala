package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.MinHashSlices.minhash_slices

/** Parity of the fused MinHash signature expression against the relational
  * explode + 8-min aggregate it replaces inside `dd_minhash_lsh` (and the
  * candidate feeds of dd_components / dd_canonical / dd_triangles).
  */
class MinHashSlicesSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  /** The relational signature: word-3-gram shingles, two md5 digests per
    * shingle (`md5(shingle)` for slices 0-3, `md5(shingle || "#2")` for
    * 4-7), 8 minima of 8-hex-char (32-bit) slices.
    */
  private def relationalMins(corpus: DataFrame): DataFrame = {
    val sh = corpus
      .withColumn("words", split(col("text"), " "))
      .select(col("doc_id"),
        explode(expr(
          """transform(sequence(1, size(words) - 2),
             i -> concat_ws(' ', element_at(words, i),
                            element_at(words, i + 1), element_at(words, i + 2)))"""))
          .as("shingle"))
      .withColumn("h", md5(col("shingle")))
      .withColumn("h2", md5(concat(col("shingle"), lit("#2"))))
    val aggs = (0 until 8).map(j =>
      min(expr(s"substr(${if (j < 4) "h" else "h2"}, ${8 * (j % 4) + 1}, 8)"))
        .as(s"mh$j"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  private def fusedMins(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"), minhash_slices(col("text")).as("mh"))
      .filter(col("mh").isNotNull)
      .select(col("doc_id") +:
        (0 until 8).map(j => col("mh").getItem(j).as(s"mh$j")): _*)

  test("fused expression equals the relational signature on the corpus") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val rel = relationalMins(corpus)
    val fused = fusedMins(corpus)
    assert(rel.count() == fused.count())
    assert(rel.exceptAll(fused).count() == 0)
    assert(fused.exceptAll(rel).count() == 0)
  }

  test("edge shapes: repeated words, multi-space empties, unicode") {
    import spark.implicits._
    val edge = Seq(
      (1L, "a a a a a"),
      (2L, "x  y  z"), // empty words from double spaces survive the split
      (3L, "été café naïve résumé"),
      (4L, "one two three")
    ).toDF("doc_id", "text")
    val rel = relationalMins(edge)
    val fused = fusedMins(edge)
    assert(rel.exceptAll(fused).count() == 0)
    assert(fused.exceptAll(rel).count() == 0)
  }

  test("documents with fewer than 3 words yield NULL (absent)") {
    import spark.implicits._
    val df = Seq((1L, "two words"), (2L, "one"), (3L, ""), (4L, "a b c"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), minhash_slices(col("text")).as("mh"))
    assert(df.filter(col("mh").isNull).collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L))
    assert(df.filter(col("mh").isNotNull).count() == 1)
  }

  test("fused SimHash32 equals the relational 32-vote aggregate") {
    import graft.functions.SimHash32.simhash32
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    def nib(h: String, k: Int) =
      s"(instr('0123456789abcdef', substr($h, $k, 1)) - 1)"
    val words = corpus
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .withColumn("h", md5(col("word")))
      .withColumn("v", expr(
        (1 to 8).map(k => s"${nib("h", k)} * ${1L << (4 * (8 - k))}L")
          .mkString(" + ")))
    val aggs = (0 until 32).map(j =>
      sum(expr(s"IF((v div ${1L << j}L) % 2 = 1, 1, -1)")).as(s"b$j"))
    val rel = words.groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), expr(
        (0 until 32).map(j => s"IF(b$j > 0, ${1L << j}L, 0L)")
          .mkString(" + ")).as("simhash"))
    val fused = corpus.select(col("doc_id"), simhash32(col("text")).as("simhash"))
    assert(rel.exceptAll(fused).count() == 0)
    assert(fused.exceptAll(rel).count() == 0)
  }

  test("dd_minhash_lsh candidates are unchanged by the fused path") {
    // the gate itself re-verifies against DuckDB; this pins the Scala-side
    // refactor produced the same candidate set as the relational build
    val cand = SparkEntry.queries("dd_minhash_lsh")(spark, sf)
    val corpus = {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "text")
      docs.unionByName(
        docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            concat(regexp_replace(col("text"), "data", "info"), lit(" xtra"))
              .as("text")))
    }
    val mins = relationalMins(corpus)
    val sig = mins.select(col("doc_id"),
      explode(expr(
        """array(struct(0 AS band, concat(mh0, mh1) AS bandval),
                 struct(1 AS band, concat(mh2, mh3) AS bandval),
                 struct(2 AS band, concat(mh4, mh5) AS bandval),
                 struct(3 AS band, concat(mh6, mh7) AS bandval))""")).as("bv"))
      .select(col("doc_id"), col("bv.band"), col("bv.bandval"))
    val want = sig.as("a").join(sig.as("b"),
        expr("a.band = b.band AND a.bandval = b.bandval AND a.doc_id < b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    assert(cand.exceptAll(want).count() == 0)
    assert(want.exceptAll(cand).count() == 0)
  }
}
