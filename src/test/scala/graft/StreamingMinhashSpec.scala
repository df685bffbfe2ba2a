package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The streaming LSH admission check must agree row-for-row with its batch
  * twin computed in the same session (the DuckDB hash gate re-checks the
  * same equality engine-externally at sf0.01).
  */
class StreamingMinhashSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  test("st_dd_minhash equals the batch band join over the parity split") {
    import graft.functions.MinHashSlices.minhash_slices
    val out = SparkEntry.queries("st_dd_minhash")(spark, sf).cache()
    try {
      def sig(parity: Int) = spark.read.parquet(s"$sf/documents.parquet")
        .filter(col("doc_id") % 2 === parity)
        .select(col("doc_id"), minhash_slices(col("text")).as("mh"))
        .filter(col("mh").isNotNull)
        .select(col("doc_id"), posexplode(expr(
          """array(concat(mh[0], mh[1]), concat(mh[2], mh[3]),
                   concat(mh[4], mh[5]), concat(mh[6], mh[7]))""")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandval")
      val batch = sig(1)
        .join(sig(0).select(col("doc_id").as("idx_id"), col("band"),
          col("bandval")), Seq("band", "bandval"))
        .groupBy("doc_id", "idx_id").agg(count(lit(1)).as("n_bands"))
      assert(out.count() == batch.count())
      assert(out.join(batch, Seq("doc_id", "idx_id", "n_bands"), "left_anti")
        .count() == 0, "stream rows must all appear in the batch twin")
      assert(out.filter(col("n_bands") < 1 || col("n_bands") > 4).count() == 0)
      assert(out.filter(col("doc_id") % 2 === 0 || col("idx_id") % 2 =!= 0)
        .count() == 0, "stream side odd, index side even")
    } finally out.unpersist()
  }
}
