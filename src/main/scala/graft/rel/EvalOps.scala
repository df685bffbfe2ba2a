package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Q.tbl

/** Generation-evaluation operators — the scoring passes an LLM pipeline
  * runs over (candidate, reference) text pairs. BLEU's modified n-gram
  * precision (Papineni et al. 2002) stays in EXACT integers here: each
  * pair reports clipped matches and totals per n-gram order, never the
  * final ratio — the downstream corpus-BLEU divides once at the end,
  * which is also how the metric is defined (corpus-level, not
  * sentence-averaged).
  *
  * Scale shape: n-gram counting is explode + hash aggregate keyed by
  * (pair, gram); the clip is an equi-join of the two count relations on
  * the same key. Everything shuffles on (pair, gram) — no windows, no
  * cross products; 100 TB of eval pairs parallelize by pair.
  */
object EvalOps {

  def all: Seq[Q] = Seq(

    // Modified 1-gram and 2-gram precision per (candidate, reference)
    // pair: candidates are the doc_id % 20 stratum, each evaluated
    // against the next document (doc_id + 1) as its reference. clipped_n
    // = sum over candidate grams of min(cand_count, ref_count); total_n =
    // candidate gram count. The pair relation stays exact-integer all the
    // way through the gate.
    Q("tx_bleu", (s, d) => {
      val docs = tbl(s, d, "documents")
      val cand = docs.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("cid"), col("text"))
      val ref = docs.select((col("doc_id") - 1).as("cid"),
        col("doc_id").as("rid"), col("text").as("rtext"))
      val pairs = cand.join(ref, "cid")

      // one-token texts yield no bigrams (and so drop from the order-2
      // relation) — Spark needs the explicit guard because
      // sequence(1, 0) would count DOWN, not empty out
      def grams(textCol: String, n: Int) =
        if (n == 1) explode(split(col(textCol), " "))
        else explode(expr(
          s"""CASE WHEN size(split($textCol, ' ')) < 2
                THEN CAST(array() AS ARRAY<STRING>)
                ELSE transform(sequence(1, size(split($textCol, ' ')) - 1),
                  i -> concat(element_at(split($textCol, ' '), i), ' ',
                              element_at(split($textCol, ' '), i + 1)))
              END"""))

      def prec(n: Int): DataFrame = {
        val cc = pairs.select(col("cid"), grams("text", n).as("g"))
          .groupBy("cid", "g").agg(count(lit(1)).as("cn"))
        val rc = pairs.select(col("cid"), grams("rtext", n).as("g"))
          .groupBy("cid", "g").agg(count(lit(1)).as("rn"))
        cc.join(rc, Seq("cid", "g"), "left_outer")
          .groupBy("cid")
          .agg(sum(least(col("cn"), coalesce(col("rn"), lit(0L))))
            .as(s"clipped$n"),
            sum(col("cn")).as(s"total$n"))
      }
      pairs.select("cid", "rid")
        .join(prec(1), "cid").join(prec(2), "cid")
    }, Some("""
      WITH cand AS (
        SELECT doc_id AS cid, text FROM documents WHERE doc_id % 20 = 0),
      ref AS (
        SELECT doc_id - 1 AS cid, doc_id AS rid, text AS rtext
        FROM documents),
      pairs AS (SELECT c.cid, r.rid, c.text, r.rtext
                FROM cand c JOIN ref r USING (cid)),
      cu AS (SELECT cid, unnest(string_split(text, ' ')) AS g FROM pairs),
      ru AS (SELECT cid, unnest(string_split(rtext, ' ')) AS g FROM pairs),
      cb AS (SELECT cid, w[i] || ' ' || w[i + 1] AS g FROM (
               SELECT cid, string_split(text, ' ') AS w,
                      unnest(range(1, len(string_split(text, ' ')))) AS i
               FROM pairs)),
      rb AS (SELECT cid, w[i] || ' ' || w[i + 1] AS g FROM (
               SELECT cid, string_split(rtext, ' ') AS w,
                      unnest(range(1, len(string_split(rtext, ' ')))) AS i
               FROM pairs)),
      cc1 AS (SELECT cid, g, count(*) AS cn FROM cu GROUP BY 1, 2),
      rc1 AS (SELECT cid, g, count(*) AS rn FROM ru GROUP BY 1, 2),
      cc2 AS (SELECT cid, g, count(*) AS cn FROM cb GROUP BY 1, 2),
      rc2 AS (SELECT cid, g, count(*) AS rn FROM rb GROUP BY 1, 2),
      p1 AS (SELECT cc1.cid,
                    CAST(sum(least(cc1.cn, coalesce(rc1.rn, 0))) AS BIGINT)
                      AS clipped1,
                    CAST(sum(cc1.cn) AS BIGINT) AS total1
             FROM cc1 LEFT JOIN rc1 ON cc1.cid = rc1.cid AND cc1.g = rc1.g
             GROUP BY 1),
      p2 AS (SELECT cc2.cid,
                    CAST(sum(least(cc2.cn, coalesce(rc2.rn, 0))) AS BIGINT)
                      AS clipped2,
                    CAST(sum(cc2.cn) AS BIGINT) AS total2
             FROM cc2 LEFT JOIN rc2 ON cc2.cid = rc2.cid AND cc2.g = rc2.g
             GROUP BY 1)
      SELECT p.cid, p.rid, p1.clipped1, p1.total1, p2.clipped2, p2.total2
      FROM pairs p JOIN p1 ON p.cid = p1.cid JOIN p2 ON p.cid = p2.cid""")),

    // ROUGE-1/2 recall — BLEU's recall-oriented sibling (Lin 2004), the
    // summarization-eval workhorse: over the SAME candidate/reference
    // pairing, the fraction of REFERENCE n-grams the candidate covers.
    // The iteration flips to the reference side (ref counts left-join
    // candidate counts), denominators are reference totals, and the
    // per-pair recalls are single divisions of the exact clipped/total
    // integers the gate also emits raw. Same (pair, gram)-keyed shuffle
    // shape as tx_bleu. (ROUGE-L's LCS is quadratic per pair and left
    // out by design; the n-gram family is what corpus-scale eval runs.)
    Q("tx_rouge", (s, d) => {
      val docs = tbl(s, d, "documents")
      val cand = docs.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("cid"), col("text"))
      val ref = docs.select((col("doc_id") - 1).as("cid"),
        col("doc_id").as("rid"), col("text").as("rtext"))
      val pairs = cand.join(ref, "cid")
      def grams(textCol: String, n: Int) =
        if (n == 1) explode(split(col(textCol), " "))
        else explode(expr(
          s"""CASE WHEN size(split($textCol, ' ')) < 2
                THEN CAST(array() AS ARRAY<STRING>)
                ELSE transform(sequence(1, size(split($textCol, ' ')) - 1),
                  i -> concat(element_at(split($textCol, ' '), i), ' ',
                              element_at(split($textCol, ' '), i + 1)))
              END"""))
      def recall(n: Int): DataFrame = {
        val cc = pairs.select(col("cid"), grams("text", n).as("g"))
          .groupBy("cid", "g").agg(count(lit(1)).as("cn"))
        val rc = pairs.select(col("cid"), grams("rtext", n).as("g"))
          .groupBy("cid", "g").agg(count(lit(1)).as("rn"))
        rc.join(cc, Seq("cid", "g"), "left_outer")
          .groupBy("cid")
          .agg(sum(least(col("rn"), coalesce(col("cn"), lit(0L))))
            .as(s"match$n"),
            sum(col("rn")).as(s"ref_total$n"))
      }
      pairs.select("cid", "rid")
        .join(recall(1), "cid").join(recall(2), "cid")
        .withColumn("rouge1", expr("match1 / ref_total1"))
        .withColumn("rouge2", expr("match2 / ref_total2"))
    }, Some("""
      WITH cand AS (
        SELECT doc_id AS cid, text FROM documents WHERE doc_id % 20 = 0),
      ref AS (
        SELECT doc_id - 1 AS cid, doc_id AS rid, text AS rtext
        FROM documents),
      pairs AS (SELECT c.cid, r.rid, c.text, r.rtext
                FROM cand c JOIN ref r USING (cid)),
      cu AS (SELECT cid, unnest(string_split(text, ' ')) AS g FROM pairs),
      ru AS (SELECT cid, unnest(string_split(rtext, ' ')) AS g FROM pairs),
      cb AS (SELECT cid, w[i] || ' ' || w[i + 1] AS g FROM (
               SELECT cid, string_split(text, ' ') AS w,
                      unnest(range(1, len(string_split(text, ' ')))) AS i
               FROM pairs)),
      rb AS (SELECT cid, w[i] || ' ' || w[i + 1] AS g FROM (
               SELECT cid, string_split(rtext, ' ') AS w,
                      unnest(range(1, len(string_split(rtext, ' ')))) AS i
               FROM pairs)),
      cc1 AS (SELECT cid, g, count(*) AS cn FROM cu GROUP BY 1, 2),
      rc1 AS (SELECT cid, g, count(*) AS rn FROM ru GROUP BY 1, 2),
      cc2 AS (SELECT cid, g, count(*) AS cn FROM cb GROUP BY 1, 2),
      rc2 AS (SELECT cid, g, count(*) AS rn FROM rb GROUP BY 1, 2),
      p1 AS (SELECT rc1.cid,
                    CAST(sum(least(rc1.rn, coalesce(cc1.cn, 0))) AS BIGINT)
                      AS match1,
                    CAST(sum(rc1.rn) AS BIGINT) AS ref_total1
             FROM rc1 LEFT JOIN cc1 ON rc1.cid = cc1.cid AND rc1.g = cc1.g
             GROUP BY 1),
      p2 AS (SELECT rc2.cid,
                    CAST(sum(least(rc2.rn, coalesce(cc2.cn, 0))) AS BIGINT)
                      AS match2,
                    CAST(sum(rc2.rn) AS BIGINT) AS ref_total2
             FROM rc2 LEFT JOIN cc2 ON rc2.cid = cc2.cid AND rc2.g = cc2.g
             GROUP BY 1)
      SELECT p.cid, p.rid, p1.match1, p1.ref_total1, p2.match2, p2.ref_total2,
             p1.match1 / p1.ref_total1 AS rouge1,
             p2.match2 / p2.ref_total2 AS rouge2
      FROM pairs p JOIN p1 ON p.cid = p1.cid JOIN p2 ON p.cid = p2.cid""")))
}
