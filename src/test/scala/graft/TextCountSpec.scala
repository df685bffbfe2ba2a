package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WsTokenCount vs the composable split/filter form — equivalence on edge
  * strings (runs of spaces, leading/trailing, empty, single token) and on
  * the real corpus, in both codegen and interpreted paths.
  */
class TextCountSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private val edges = Seq("", " ", "   ", "a", " a", "a ", " a ",
    "a b", "a  b", "  a  b  ", "one two three", "x".repeat(1000),
    ("w " * 500).trim)

  test("native count equals split+filter on edge strings") {
    import spark.implicits._
    val df = edges.toDF("t")
      .select(col("t"),
        graft.functions.WsTokenCount(col("t")).as("native"),
        expr("CAST(size(filter(split(t, ' '), x -> length(x) > 0)) AS BIGINT)")
          .as("composed"))
    val rows = df.collect()
    for (r <- rows)
      assert(r.getLong(1) == r.getLong(2), s"'${r.getString(0)}'")
    // expected absolute values for a few knowns
    val byT = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byT("") == 0L && byT("   ") == 0L && byT(" a ") == 1L &&
      byT("a  b") == 2L && byT("one two three") == 3L)
  }

  test("native count equals split+filter corpus-wide and via SQL") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
      graft.functions.WsTokenCount(col("text")).as("native"),
      expr("CAST(size(filter(split(text, ' '), x -> length(x) > 0)) AS BIGINT)")
        .as("composed"))
      .filter(col("native") =!= col("composed")).count()
    assert(diff == 0L)
    // SQL registration path
    graft.functions.GraftFunctions.register(spark)
    docs.createOrReplaceTempView("docs_tc")
    val viaSql = spark.sql(
      "SELECT sum(ws_token_count(text)) FROM docs_tc").collect()(0).getLong(0)
    val viaCol = docs.select(sum(graft.functions.WsTokenCount(col("text"))))
      .collect()(0).getLong(0)
    assert(viaSql == viaCol && viaSql > 0L)
  }
}
