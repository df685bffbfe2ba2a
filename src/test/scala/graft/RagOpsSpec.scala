package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RagOps + the streaming centroid assignment: differential checks against
  * plain-Scala recomputations and cross-operator invariants the DuckDB
  * hash gates can't express (self-joins against the source table,
  * streaming-vs-batch parity inside one session).
  */
class RagOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("tx_chunk equals a plain-Scala sliding-window recomputation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = run("tx_chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3)))
      .toMap
    val expect = docs.flatMap { case (id, text) =>
      val w = text.split(" ", -1) // keep empties: Spark split has no limit cut
      val starts = 0 to ((w.length - 1) / 48)
      starts.map { i =>
        val chunk = w.slice(i * 48, i * 48 + 64)
        (id, i.toLong) -> (chunk.length.toLong, md5hex(chunk.mkString(" ")))
      }
    }
    assert(got.size === expect.size)
    assert(got === expect)
  }

  test("chunking boundary cases: stride multiples, singletons, empty text") {
    import spark.implicits._
    // token counts straddling every boundary: W=64, S=48
    val cases = Seq(0, 1, 47, 48, 49, 63, 64, 65, 96, 112, 113, 160)
    val docs = cases.zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(k => s"w$k").mkString(" "))
    }.toDF("doc_id", "text")
    val got = graft.rel.RagOps.chunk(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.zipWithIndex.foreach { case (n, i) =>
      // split("", -1) yields [""], so "0 tokens" is 1 empty token — the
      // convention both engines share
      val t = math.max(n, 1)
      val nChunks = (t - 1) / 48 + 1
      val mine = got.filter(_._1._1 == i.toLong)
      assert(mine.size === nChunks, s"doc with $n tokens")
      (0 until nChunks).foreach { c =>
        val expect = math.min(64, t - c * 48)
        assert(mine((i.toLong, c.toLong)) === expect,
          s"doc $n tokens chunk $c length")
      }
    }
  }

  test("tx_postings: df == posting length, lists sorted, band relative") {
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    val rows = run("tx_postings").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1)
      val ids = r.getString(2).split(",").map(_.toLong)
      assert(ids.length.toLong === df, s"term ${r.getString(0)}")
      assert(ids.sameElements(ids.sorted), s"term ${r.getString(0)} unsorted")
      assert(ids.distinct.length === ids.length)
      assert(df >= n / 100.0 && df * 5 <= n * 4)
    }
  }

  test("tx_negatives: same-source, no self, ranks distinct, deterministic") {
    val srcOf = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = run("tx_negatives").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, rank, neg) =>
      assert(a != neg, s"self-negative for $a")
      assert(srcOf(a) == srcOf(neg), s"cross-source negative $a -> $neg")
      assert(rank >= 1 && rank <= 4)
    }
    rows.groupBy(_._1).foreach { case (a, g) =>
      assert(g.map(_._2).distinct.length === g.length, s"dup rank for $a")
      assert(g.map(_._3).distinct.length === g.length, s"dup negative for $a")
    }
    assert(run("tx_negatives").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      === rows.sorted)
  }

  test("tx_pack_tokens conserves every token and only the last row is short") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).length).toMap
    val rows = run("tx_pack_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // token conservation per shard: packed tokens == doc tokens + one
    // <eos> per doc
    val packedPerShard = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    val expectPerShard = docs.groupBy(_._1 / 50).view
      .mapValues(g => g.values.map(_ + 1L).sum)
    assert(packedPerShard.toMap === expectPerShard.toMap)
    // density: every window is full except possibly the last of its shard
    rows.groupBy(_._1).foreach { case (sh, g) =>
      val last = g.map(_._2).max
      g.foreach { case (_, win, n) =>
        if (win < last) assert(n === 128L, s"short interior row $sh/$win")
        else assert(n >= 1L && n <= 128L)
      }
    }
  }

  test("st_vec_assign matches the batch argmax over the same codebook") {
    val batch = {
      val qv = spark.read.parquet(s"$sf/embeddings.parquet")
        .selectExpr("vec_id",
          "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv")
      val cents = qv.filter(col("vec_id") % 100 === 7)
        .select(col("vec_id").as("cid"), col("qv").as("cv"))
      qv.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"),
          graft.functions.VectorFunctions.long_dot(col("qv"), col("cv"))
            .as("cdot"))
        .groupBy("vec_id")
        .agg(max(struct(col("cdot"), (-col("cid")).as("nc"), col("cid")))
          .as("m"))
        .groupBy(col("m.cid").as("cid"))
        .agg(count(lit(1)).as("n"), sum(col("m.cdot")).as("sum_dot"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    }
    val got = run("st_vec_assign").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.nonEmpty && got === batch)
    // every vector is assigned exactly once
    assert(got.values.map(_._1).sum ===
      spark.read.parquet(s"$sf/embeddings.parquet").count())
  }

  test("rag_rrf: fusion scores decompose into the two rank lists") {
    val rows = run("rag_rrf").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val rl = if (r.isNullAt(r.fieldIndex("r_lex"))) None
        else Some(r.getAs[Int]("r_lex"))
      val rv = if (r.isNullAt(r.fieldIndex("r_vec"))) None
        else Some(r.getAs[Int]("r_vec"))
      assert(rl.isDefined || rv.isDefined)
      assert(rl.forall(x => x >= 1 && x <= 10) &&
        rv.forall(x => x >= 1 && x <= 10))
      val expect = rl.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rv.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(r.getAs[Double]("rrf") == expect)
    }
    // per query: fused ranks are 1..n dense and ordered by (rrf desc, cand)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Int]("fused_rank"))
      assert(sorted.map(_.getAs[Int]("fused_rank")).toSeq ==
        (1 to g.length))
      val keys = sorted.map(r =>
        (-r.getAs[Double]("rrf"), r.getAs[Long]("cand")))
      assert(keys.toSeq == keys.sortBy(identity).toSeq)
      // each ranker contributes its full top-10 (or the whole corpus if
      // smaller), so a doc in both lists implies fewer fused rows
      assert(g.length >= 10 && g.length <= 20)
    }
  }

  test("rag_rrf broadcasts both query strata (no shuffled cartesian)") {
    val p = run("rag_rrf").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"), s"shuffled cartesian:\n$p")
  }
}
