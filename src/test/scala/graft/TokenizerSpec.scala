package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the BPE tokenizer-induction operators. The hash-vs-DuckDB
  * gate is the driver's; these pin the merge semantics themselves.
  */
class TokenizerSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("armored replace implements BPE's left-to-right scan order") {
    import spark.implicits._
    // "aaaa" + merge (a,a) must become [aa, aa]; "aaa" → [aa, a]
    val df = Seq("aaaa", "aaa", "abab").toDF("w")
      .select(regexp_replace(col("w"), "(.)", "|$1|").as("sym"))
      .select(replace(col("sym"), lit("|a||a|"), lit("|aa|")).as("sym"))
      .select(split(expr("trim(BOTH '|' FROM sym)"), raw"\|\|").as("t"))
    val got = df.collect().map(_.getSeq[String](0).mkString(" "))
    assert(got.toSet == Set("aa aa", "aa a", "a b a b"))
  }

  test("tx_bpe_train merges are frequency-sane and strictly applied") {
    val rows = q("tx_bpe_train").orderBy("round").collect()
    assert(rows.length == 3)
    // a merged pair's count never exceeds the previous round's winner count
    // (merging only removes occurrences of other pairs, never adds beyond)
    val cnts = rows.map(_.getLong(3))
    assert(cnts.forall(_ > 0))
    // round stats: the winner is counted among that round's pairs
    rows.foreach { r =>
      assert(r.getLong(4) > 0 && r.getLong(5) >= r.getLong(3))
    }
    // winners are distinct as (p1,p2) pairs across rounds: after a merge
    // the pair no longer exists in the symbol stream
    val pairs = rows.map(r => (r.getString(1), r.getString(2)))
    assert(pairs.distinct.length == 3)
  }

  test("tx_bpe_apply compresses: tokens <= words * max_word_len, >= words") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("nw"))
    val df = q("tx_bpe_apply").join(docs, "doc_id")
    // every word is >= 1 token, and 3 merges can at most halve 3 pairs —
    // token count stays within [words, chars]
    assert(df.filter(col("bpe_tokens") < col("words")).count() == 0)
    val chars = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        (length(col("text")) + lit(1) - size(split(col("text"), " ")))
          .cast("long").as("nc"))
    assert(df.join(chars, "doc_id")
      .filter(col("bpe_tokens") > col("nc")).count() == 0)
  }
}
