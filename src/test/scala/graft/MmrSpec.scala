package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MMR diversification replayed in plain Scala: collect each query's
  * candidate relevances and pairwise sims, run the greedy recurrence
  * directly, and require the relational unrolling to produce the exact
  * selection sequence.
  */
class MmrSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  test("relational MMR equals a direct greedy replay") {
    val got = SparkEntry.queries("ann_mmr")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (q, rows) =>
        q -> rows.sortBy(_._2).map(_._3).toSeq
      }

    // rebuild candidates + sims with one query, replay greedy in Scala
    val qv = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv")
    val rows = qv.as("b")
      .join(broadcast(qv.filter(col("vec_id") % 50 === 0).as("a")),
        expr("a.vec_id != b.vec_id"))
      .selectExpr("a.vec_id AS q_id", "b.vec_id AS cand",
        "aggregate(zip_with(a.qv, b.qv, (x, y) -> x * y), 0L, (s, x) -> s + x) AS rel",
        "b.qv AS cqv")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3).toArray))

    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum

    val expect = rows.groupBy(_._1).map { case (q, all) =>
      val top10 = all.sortBy(t => (-t._3, t._2)).take(10)
      val vecs = top10.map(t => t._2 -> t._4).toMap
      val rel = top10.map(t => t._2 -> t._3).toMap
      var selected = Vector(top10.map(t => (t._3, -t._2)).max._2 * -1)
      while (selected.length < 5) {
        val remaining = top10.map(_._2).filterNot(selected.contains)
        val next = remaining.map { c =>
          val pen = selected.map(s => dot(vecs(c), vecs(s))).max
          (7L * rel(c) - 3L * pen, -c)
        }.max
        selected :+= -next._2
      }
      q -> selected
    }

    assert(got.keySet == expect.keySet)
    for ((q, sel) <- expect)
      assert(got(q) == sel, s"query $q: got ${got(q)} want $sel")
  }
}
