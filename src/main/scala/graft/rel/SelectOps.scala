package graft.rel

import org.apache.spark.sql.functions._
import Q.tbl

/** Corpus-selection operators — the cleanup + selection passes a training-data
  * pipeline runs between dedup and shard packing:
  *
  *  - `tx_boilerplate`: corpus-frequency line removal (the C4 / RefinedWeb
  *    boilerplate rule — a line occurring in many DISTINCT documents is
  *    navigation/license chrome, not content; cf. the reference's curation
  *    framing in SURVEY.md §2.6, and `dd_paragraph` for the first-occurrence
  *    variant of the same sentence relation).
  *  - `tx_quality_clf`: a corpus-TRAINED quality classifier (the GPT-3 /
  *    CCNet "looks like the good subset" filter) — Naive-Bayes-shaped:
  *    per-token class-purity weights fitted on a deterministic hash split,
  *    scored by a token-weight join + per-doc sum.
  *  - `tx_weighted_sample`: deterministic weighted sampling without
  *    replacement per source (hash-priority variant of
  *    Efraimidis–Spirakis A-Res), the "take k docs per domain, prefer
  *    heavier ones" selection step.
  *
  * Oracle-parity rules (see [[Q]]): md5-hex is the shared hash primitive,
  * all scoring is scaled-integer (`div`), every computed column is aliased
  * identically on both sides.
  *
  * At 100 TB: every operator here is scan + hash-aggregate + equi-join.
  * The boilerplate set and the token-weight table are vocabulary-sized —
  * orders of magnitude below the corpus — so their join-back sides
  * broadcast; the sampling window partitions by source (and the scale-safe
  * form is per-partition top-k + driver merge of k·sources rows, which
  * `q7_topk` already pins via TakeOrderedAndProject).
  */
object SelectOps {

  /** 10-word sentence slices, the corpus-wide line unit shared with
    * `dd_paragraph` (CurationOps) so both line operators agree on what a
    * "line" is.
    */
  private val SLICES_SPARK =
    """transform(sequence(0, (size(words) - 1) div 10),
       s -> concat_ws(' ', slice(words, s * 10 + 1, 10)))"""

  private val SENTS_SQL = """
      WITH sents AS (
        SELECT doc_id,
               generate_subscripts(ss, 1) - 1 AS sent_idx,
               unnest(ss) AS sent
        FROM (SELECT doc_id,
                list_transform(range(0, (len(words) - 1) // 10 + 1),
                  s -> array_to_string(words[s * 10 + 1 : s * 10 + 10], ' ')) AS ss
              FROM (SELECT doc_id, string_split(text, ' ') AS words
                    FROM documents)))"""

  /** Two-nibble (0..255) md5 bucket — same construction as CurationOps. */
  private def bucket(idExpr: String, cast: String) = {
    def nb(k: Int) =
      s"(instr('0123456789abcdef', substr(md5(CAST($idExpr AS $cast)), $k, 1)) - 1)"
    s"(${nb(1)} * 16 + ${nb(2)})"
  }

  /** Eight-nibble (0 .. 2^32-1) md5 integer — the deterministic uniform both
    * engines evaluate identically (each nibble CAST to BIGINT before the
    * power-of-16 scale so no 32-bit intermediate can overflow).
    */
  private[graft] def hash32(idExpr: String, cast: String) = {
    def nb(k: Int) =
      s"(instr('0123456789abcdef', substr(md5(CAST($idExpr AS $cast)), $k, 1)) - 1)"
    (1 to 8)
      .map(k => s"CAST(${nb(k)} AS BIGINT) * CAST(${1L << (4 * (8 - k))} AS BIGINT)")
      .mkString("(", " + ", ")")
  }

  def all: Seq[Q] = Seq(

    // -- corpus-frequency boilerplate removal (C4 / RefinedWeb) --------------
    // A sentence occurring in >= 3 DISTINCT documents is boilerplate; every
    // occurrence is dropped and the surviving text re-assembled in order and
    // fingerprinted. Differs from dd_paragraph (keep FIRST occurrence) — the
    // frequency rule deletes ALL occurrences of chrome lines. Shape at
    // 100 TB: one explode, one (sent, doc) distinct + sentence-keyed count
    // (the only wide ops, map-side combinable), then a LEFT join back against
    // only the sentences that crossed the threshold — a vocabulary-sized,
    // broadcastable relation (hinted below; switch the key to md5(sent) for
    // long lines with the shape unchanged).
    Q("tx_boilerplate", (s, d) => {
      val sents = tbl(s, d, "documents")
        .withColumn("words", split(col("text"), " "))
        .select(col("doc_id"), posexplode(expr(SLICES_SPARK)))
        .withColumnRenamed("pos", "sent_idx")
        .withColumnRenamed("col", "sent")
      val bp = sents.select("sent", "doc_id").distinct()
        .groupBy("sent").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 3)
        .select(col("sent"), lit(1).as("bp"))
      sents.join(broadcast(bp), Seq("sent"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sents"),
          sum(when(col("bp").isNull, 1L).otherwise(0L)).as("n_kept"),
          md5(concat_ws(" ",
            expr("""transform(
                      array_sort(collect_list(
                        CASE WHEN bp IS NULL THEN struct(sent_idx, sent) END)),
                      x -> x.sent)"""))).as("fp"))
    }, Some(SENTS_SQL + """,
      bp AS (
        SELECT sent FROM (
          SELECT sent, count(DISTINCT doc_id) AS df FROM sents GROUP BY sent)
        WHERE df >= 3)
      SELECT s.doc_id,
             count(*) AS n_sents,
             CAST(count(*) FILTER (WHERE b.sent IS NULL) AS BIGINT) AS n_kept,
             md5(coalesce(string_agg(CASE WHEN b.sent IS NULL THEN s.sent END,
                                     ' ' ORDER BY s.sent_idx), '')) AS fp
      FROM sents s LEFT JOIN bp b ON s.sent = b.sent
      GROUP BY s.doc_id""")),

    // -- corpus-trained quality classifier (GPT-3 / CCNet filter shape) ------
    // Fit on the md5-bucket train split (buckets 0..191 of 256, 75%): label
    // "good" = n_chars >= 300 (the stand-in for "came from the curated
    // subset"); per token, the signed vote weight is the scaled-integer
    // Laplace purity CENTERED at the train base rate:
    //   wt(w) = (pos_w+1)*1e6 div (tot_w+2)  -  (pos+1)*1e6 div (tot+2)
    // — the engine-exact stand-in for the Naive Bayes log-odds (monotone in
    // it, no transcendentals, so DuckDB and Spark agree bit-for-bit; the
    // centering removes the base-rate term so a token votes only on its
    // EXCESS association with the good class). Score = sum of weights over
    // the doc's token OCCURRENCES; pred = score >= 0. Shape at 100 TB:
    // token-keyed training aggregate (map-side combinable, vocabulary-sized
    // output), one scalar base-rate aggregate, weight table joins back as a
    // broadcast, per-doc sum. Production swaps the token key for
    // pmod(xxhash64(w), 2^20) to bound the vocab — shape unchanged (cf.
    // tx_dsir); unseen tokens vote 0 via the left join. SelectOpsSpec pins
    // signal recovery on a planted vocabulary-split corpus.
    Q("tx_quality_clf", (s, d) => {
      val words = tbl(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          explode(split(col("text"), " ")).as("w"))
      val tr = words.filter(expr(s"${bucket("doc_id", "STRING")} < 192"))
      val base = tr.agg(expr(
        """(sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) + 1) * 1000000
           div (count(1) + 2)""").as("base"))
      val weights = tr.groupBy("w")
        .agg(sum(when(col("n_chars") >= 300, 1L).otherwise(0L)).as("pc"),
          count(lit(1)).as("tc"))
        .crossJoin(broadcast(base))
        .select(col("w"),
          expr("((pc + 1) * 1000000) div (tc + 2) - base").as("wt"))
      words.join(broadcast(weights), Seq("w"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum(coalesce(col("wt"), lit(0L))).as("score"))
        .withColumn("pred", when(col("score") >= 0, 1).otherwise(0))
    }, Some(s"""
      WITH words AS (
        SELECT doc_id, n_chars, unnest(string_split(text, ' ')) AS w
        FROM documents),
      tr AS (SELECT * FROM words WHERE ${bucket("doc_id", "VARCHAR")} < 192),
      base AS (
        SELECT (count(*) FILTER (WHERE n_chars >= 300) + 1) * 1000000
                 // (count(*) + 2) AS b
        FROM tr),
      wt AS (
        SELECT w, ((pc + 1) * 1000000) // (tc + 2) - (SELECT b FROM base) AS wt
        FROM (SELECT w,
                     CAST(count(*) FILTER (WHERE n_chars >= 300) AS BIGINT) AS pc,
                     CAST(count(*) AS BIGINT) AS tc
              FROM tr GROUP BY w))
      SELECT d.doc_id, count(*) AS n_words,
             CAST(sum(coalesce(wt.wt, 0)) AS BIGINT) AS score,
             CASE WHEN CAST(sum(coalesce(wt.wt, 0)) AS BIGINT) >= 0
                  THEN 1 ELSE 0 END AS pred
      FROM words d LEFT JOIN wt ON d.w = wt.w
      GROUP BY d.doc_id""")),

    // -- deterministic weighted sampling per source --------------------------
    // Hash-priority weighted sampling without replacement: every doc draws
    // the deterministic uniform u = md5_32(doc_id); priority
    // u * 1e6 div weight ranks heavier docs earlier in expectation
    // (weight = n_chars — prefer long documents), and the k = 10
    // smallest-priority docs per source win. The integer priority is the
    // engine-exact stand-in for Efraimidis–Spirakis -ln(u)/w (same
    // selection structure, no transcendentals). Shape at 100 TB: a narrow
    // map then a source-PARTITIONED window; the scale-safe equivalent is
    // per-partition top-k + merge of k·|sources| rows (TakeOrdered), which
    // this engine already pins for the global case in q7_topk.
    Q("tx_weighted_sample", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source").orderBy(col("priority"), col("doc_id"))
      tbl(s, d, "documents")
        .withColumn("u", expr(hash32("doc_id", "STRING")))
        .withColumn("priority",
          expr("(u * 1000000) div greatest(n_chars, 1)"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("source"), col("rk"), col("doc_id"), col("priority"))
    }, Some(WEIGHTED_SAMPLE_SQL))
  )

  /** Shared by tx_weighted_sample and its streaming twin st_tx_sample —
    * identical selection, so one oracle gates both.
    */
  private[graft] val WEIGHTED_SAMPLE_SQL = s"""
      WITH pri AS (
        SELECT source, doc_id,
               (${hash32("doc_id", "VARCHAR")} * 1000000)
                 // greatest(n_chars, 1) AS priority
        FROM documents)
      SELECT source, CAST(rk AS INTEGER) AS rk, doc_id, priority FROM (
        SELECT source, doc_id, priority,
               row_number() OVER (PARTITION BY source
                                  ORDER BY priority, doc_id) AS rk
        FROM pri)
      WHERE rk <= 10"""
}
