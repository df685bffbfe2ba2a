package graft.rel

import org.apache.spark.sql.functions._
import Q.tbl

/** Corpus-curation operators: the steps a training-data pipeline runs AFTER
  * near-dup detection — transitive dedup compaction with canonical election,
  * corpus n-gram statistics, per-document distinctive-term extraction
  * (TF-IDF), and deterministic hash-based train/val/test splitting.
  *
  * At scale: everything is scan + hash-aggregate + equi-join; the only
  * window runs per-document (bounded partitions), top-k uses
  * TakeOrderedAndProject (per-partition heap + driver merge of k rows, never
  * a single-partition sort), and the split assignment is a pure hash of the
  * key — no sampling state, rerunnable on any subset of a 100 TB corpus.
  */
object CurationOps {

  /** The SCD2 interval table (q22's body) — also the STATIC dimension the
    * streaming point-in-time lookup (st_scd_lookup) joins against.
    */
  private[graft] def scd2(s: org.apache.spark.sql.SparkSession,
                          d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // dimension versions need a valid time: un-timestamped events cannot
    // open or close an interval (shared with the streaming SCD twin)
    val ev = tbl(s, d, "events").filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_type"),
        Q.tsMillis(col("ts")).as("ts_ms"), col("event_id"))
    val wOrd = Window.partitionBy("user_id")
      .orderBy(col("ts_ms"), col("event_id"))
    val versioned = ev
      .withColumn("chg", when(
        lag(col("event_type"), 1).over(wOrd).isNull ||
          lag(col("event_type"), 1).over(wOrd) =!= col("event_type"),
        1L).otherwise(0L))
      .withColumn("version", sum("chg").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = versioned.groupBy("user_id", "version")
      .agg(min("event_type").as("event_type"),
        min("ts_ms").as("valid_from"), count(lit(1)).as("n_events"))
    val wVer = Window.partitionBy("user_id").orderBy("version")
    runs.withColumn("valid_to",
        coalesce(lead(col("valid_from"), 1).over(wVer), lit(-1L)))
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from"), col("valid_to"), col("n_events"))
  }

  /** Shared tail of the dd_components oracle: recursive closure of the
    * minhash candidate graph -> per-doc component id.
    */
  private val COMP_SQL = TextOps.MINHASH_CAND_SQL
    .replaceFirst("WITH ", "WITH RECURSIVE ") + """,
    sym AS (
      SELECT id_a AS src, id_b AS dst FROM cand
      UNION ALL SELECT id_b, id_a FROM cand),
    reach(a, b) AS (
      SELECT src, dst FROM sym
      UNION
      SELECT r.a, e.dst FROM reach r JOIN sym e ON r.b = e.src),
    comp AS (
      SELECT d.doc_id,
             CAST(least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS BIGINT) AS comp
      FROM (SELECT doc_id FROM corpus) d
      LEFT JOIN reach r ON r.a = d.doc_id
      GROUP BY d.doc_id)"""

  /** Two-nibble (0..255) integer from the head of an md5 hex digest, by
    * pure instr arithmetic — the hex-cast-free construction both engines
    * evaluate identically (DuckDB has no hex->int cast).
    */
  private[graft] def bucket(idExpr: String) = {
    def nb(k: Int) =
      s"(instr('0123456789abcdef', substr(md5(CAST($idExpr AS STRING)), $k, 1)) - 1)"
    s"(${nb(1)} * 16 + ${nb(2)})"
  }
  private[graft] def bucketSql(idExpr: String) = {
    def nb(k: Int) =
      s"(instr('0123456789abcdef', substr(md5(CAST($idExpr AS VARCHAR)), $k, 1)) - 1)"
    s"(${nb(1)} * 16 + ${nb(2)})"
  }

  def all: Seq[Q] = Seq(

    // -- transitive dedup compaction with canonical election -----------------
    // The step after dd_components in a real dedup pipeline: per connected
    // near-dup component, elect the canonical document (longest text, ties
    // to the smallest id) and mark everything else for dropping. Election
    // is a comp-PARTITIONED window (never a global order): one shuffle of
    // the scored relation, against two for the agg-argmax + self-join
    // alternative.
    Q("dd_canonical", (s, d) => {
      val edges = TextOps.minhashCand(s, d).persist()
      try {
        val corpus = TextOps.nearCorpusDf(s, d)
        val comps = GraphOps.connectedComponents(
          corpus.select(col("doc_id")), edges)
        val scored = comps.join(
          corpus.select(col("doc_id"),
            length(col("text")).cast("long").as("len")), "doc_id")
        // canonical election as a COMP-PARTITIONED window (first over
        // len desc, doc_id asc — identical tie-break to an argmax):
        // one shuffle of scored, one consumer. The former aggregate-argmax
        // + self-join shape exchanged the full scored relation twice (the
        // partial-agg exchange was cheap, the join-side re-shuffle was
        // not), plus a cache materialization to share it; caching couldn't
        // carry the partitioning either, because a cached AdaptiveSparkPlan
        // reports unknown partitioning until executed. Not a global-order
        // window: partitioned by comp, the same key the join shuffled on.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("comp").orderBy(col("len").desc, col("doc_id").asc)
        graft.Caching.releaseAfterAction(
          scored.withColumn("canonical", first("doc_id").over(w))
            .select(col("doc_id"), col("comp"), col("len"), col("canonical"),
              (col("doc_id") === col("canonical")).as("kept")),
          edges)
      } catch {
        case e: Throwable => edges.unpersist(blocking = false); throw e
      }
    }, Some(COMP_SQL + """,
      scored AS (
        SELECT c.doc_id, c.comp, CAST(length(x.text) AS BIGINT) AS len
        FROM comp c JOIN corpus x ON x.doc_id = c.doc_id),
      canon AS (
        SELECT comp AS ccomp, doc_id AS canonical FROM (
          SELECT comp, doc_id,
                 row_number() OVER (PARTITION BY comp
                                    ORDER BY len DESC, doc_id ASC) AS rn
          FROM scored) WHERE rn = 1)
      SELECT s.doc_id, s.comp, s.len, c.canonical,
             s.doc_id = c.canonical AS kept
      FROM scored s JOIN canon c ON s.comp = c.ccomp""")),

    // -- paragraph-level exact dedup (the CCNet/C4 pattern) ------------------
    // Segment every document into fixed 10-word sentences (the deterministic
    // stand-in for punctuation segmentation — the corpus has no sentence
    // marks), dedup sentences CORPUS-WIDE keeping only the first occurrence
    // (smallest doc_id, then position), and reassemble each document from
    // its surviving sentences. At scale: one explode, one hash-partitioned
    // window on the sentence text (equi-key shuffle — switch the key to
    // md5(sent) for long paragraphs and the shape is unchanged), one
    // per-document aggregate. The reassembled text is fingerprinted so the
    // gate pins the full rebuilt string, not just counts.
    Q("dd_paragraph", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      // NO spreadSmallScan here (r17 verdict #3): the per-row work between
      // scan and the window's hash exchange is one split + posexplode —
      // too thin to repay a round-robin exchange that the sentence window
      // immediately re-shuffles away (measured 0.36 s unspread vs 0.70 s
      // spread on the r17 rulers; same failure mode as tx_bm25).
      val sents = tbl(s, d, "documents")
        .withColumn("words", split(col("text"), " "))
        .select(col("doc_id"),
          posexplode(expr(
            """transform(sequence(0, (size(words) - 1) div 10),
               s -> concat_ws(' ', slice(words, s * 10 + 1, 10)))""")))
        .withColumnRenamed("pos", "sent_idx")
        .withColumnRenamed("col", "sent")
      val w = Window.partitionBy("sent").orderBy(col("doc_id"), col("sent_idx"))
      sents.withColumn("rn", row_number().over(w))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sents"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
          md5(concat_ws(" ",
            expr("""transform(
                      array_sort(collect_list(
                        CASE WHEN rn = 1 THEN struct(sent_idx, sent) END)),
                      x -> x.sent)"""))).as("fp"))
    }, Some("""
      WITH sents AS (
        SELECT doc_id,
               generate_subscripts(ss, 1) - 1 AS sent_idx,
               unnest(ss) AS sent
        FROM (SELECT doc_id,
                list_transform(range(0, (len(words) - 1) // 10 + 1),
                  s -> array_to_string(words[s * 10 + 1 : s * 10 + 10], ' ')) AS ss
              FROM (SELECT doc_id, string_split(text, ' ') AS words
                    FROM documents))),
      flagged AS (
        SELECT doc_id, sent_idx, sent,
               row_number() OVER (PARTITION BY sent
                                  ORDER BY doc_id, sent_idx) AS rn
        FROM sents)
      SELECT doc_id,
             count(*) AS n_sents,
             CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
             md5(coalesce(string_agg(CASE WHEN rn = 1 THEN sent END, ' '
                                     ORDER BY sent_idx), '')) AS fp
      FROM flagged GROUP BY doc_id""")),

    // -- cross-document duplicated-substring filter (RefinedWeb/SlimPajama) --
    // For every document: the fraction of its token 8-gram occurrences that
    // also occur in ANOTHER document; documents past the 20% threshold are
    // flagged for removal (the scaled-integer test 5*n_dup >= n_grams — no
    // float ratio crosses the gate). Sits between tx_repetition (WITHIN-doc
    // Gopher rules) and dd_exact (whole-doc): it catches boilerplate and
    // partially-copied text that neither whole-doc hashing nor within-doc
    // repetition sees. At scale: one explode, a (doc, gram) pre-aggregate
    // (map-side combinable — repeats collapse before the exchange), one
    // gram-keyed aggregate for the document-frequency, one equi-join back,
    // one per-doc aggregate. The gram string dies map-side: every exchange
    // carries only its xxhash64 (8 bytes vs ~50–100 for a text 8-gram —
    // the counts are hash-identities, so the output is unchanged short of
    // a 64-bit collision inside the corpus). Short docs (< 8 tokens) carry
    // no grams and are emitted unflagged via the left join, not dropped.
    Q("dd_substring", (s, d) => {
      // spread the scan before the 8-gram explode (guide §2.5; see
      // Q.spreadSmallScan — no-op on a production-width input)
      val docs = Q.spreadSmallScan(tbl(s, d, "documents"))
        .withColumn("words", split(col("text"), " "))
      val byDocGram = docs
        .select(col("doc_id"), explode(expr(
          """CASE WHEN size(words) >= 8 THEN
               transform(sequence(1, size(words) - 7),
                 i -> xxhash64(concat_ws(' ', slice(words, i, 8))))
             ELSE array() END""")).as("gram"))
        .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      val gramDf = byDocGram.groupBy("gram").agg(count(lit(1)).as("ndocs"))
      val perDoc = byDocGram.join(gramDf, "gram")
        .groupBy("doc_id")
        .agg(sum("c").as("n_grams"),
          sum(when(col("ndocs") > 1, col("c")).otherwise(0L)).as("n_dup"))
      docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"),
          (coalesce(col("n_dup"), lit(0L)) * 5 >=
            coalesce(col("n_grams"), lit(1L))).cast("long").as("flagged"))
    }, Some("""
      WITH g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(words) - 6),
                 i -> array_to_string(words[i : i + 7], ' '))) AS gram
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)),
      dg AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
      gs AS (SELECT gram, count(*) AS ndocs FROM dg GROUP BY gram),
      pd AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
               CAST(coalesce(sum(c) FILTER (WHERE ndocs > 1), 0) AS BIGINT) AS n_dup
        FROM dg JOIN gs USING (gram) GROUP BY doc_id)
      SELECT d.doc_id,
             coalesce(pd.n_grams, 0) AS n_grams,
             coalesce(pd.n_dup, 0) AS n_dup,
             CAST(coalesce(pd.n_dup, 0) * 5 >= coalesce(pd.n_grams, 1) AS BIGINT) AS flagged
      FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id""")),

    // -- corpus-level n-gram statistics --------------------------------------
    // Top-20 bigrams by frequency: the contamination-check / LM-statistics
    // primitive. orderBy+limit plans as TakeOrderedAndProject (bounded
    // per-partition heaps), and (n DESC, bigram ASC) is a total order so the
    // cut is deterministic.
    Q("tx_ngrams", (s, d) => {
      Q.spreadSmallScan(tbl(s, d, "documents"))
        .withColumn("words", split(col("text"), " "))
        .select(explode(expr(
          """transform(sequence(1, size(words) - 1),
             i -> concat_ws(' ', element_at(words, i), element_at(words, i + 1)))"""))
          .as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram").asc)
        .limit(20)
    }, Some("""
      WITH bi AS (
        SELECT unnest(list_transform(range(1, len(words)),
                 i -> words[i] || ' ' || words[i+1])) AS bigram
        FROM (SELECT string_split(text, ' ') AS words FROM documents))
      SELECT bigram, count(*) AS n FROM bi
      GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 20""")),

    // -- per-document distinctive terms (TF-IDF) -----------------------------
    // Top-3 terms per document. RANKING is pure integer (tf DESC, df ASC,
    // term ASC) so it cannot flip on floating-point ulps across engines;
    // the score column is the log-free idf ratio tf*N/df — an exact integer
    // product and ONE IEEE division, bit-identical in both engines, where
    // ln(N/df) diverges at the last ulp between libm implementations (the
    // log is monotone in the ratio, so ranking semantics are unchanged).
    // The corpus size reaches the plan as a broadcast 1-row aggregate, not
    // a collected literal.
    Q("tx_tfidf", (s, d) => {
      val docs = Q.spreadSmallScan(tbl(s, d, "documents"))
      val tf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("nn"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tf").desc, col("df").asc, col("term").asc)
      tf.join(df, "term").crossJoin(broadcast(n))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rn"),
          ((col("tf") * col("nn")).cast("double") / col("df").cast("double"))
            .as("tfnidf"))
    }, Some("""
      WITH tf AS (
        SELECT doc_id, term, count(*) AS tf FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents)
        GROUP BY doc_id, term),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      n AS (SELECT count(*) AS nn FROM documents)
      SELECT doc_id, term, tf, df, rn,
             CAST(tf * nn AS DOUBLE) / CAST(df AS DOUBLE) AS tfnidf
      FROM (
        SELECT t.doc_id, t.term, t.tf, d.df, nn,
               row_number() OVER (PARTITION BY t.doc_id
                                  ORDER BY t.tf DESC, d.df ASC, t.term ASC) AS rn
        FROM tf t JOIN df d ON t.term = d.term, n) WHERE rn <= 3""")),

    // -- benchmark decontamination -------------------------------------------
    // The GPT-3/PaLM decontamination pass: flag training documents sharing
    // any 4-word n-gram with the held-out eval set (here the deterministic
    // doc_id % 100 == 0 stratum). The eval side is tiny BY CONSTRUCTION
    // (benchmarks are, at any corpus scale) so it broadcasts; the train side
    // streams through one equi-join on the n-gram — no shuffle of the corpus,
    // the 100 TB decontamination shape. Output: per (train, eval) pair the
    // count of distinct shared 4-grams (4 is the longest n with nonzero
    // collisions in the synthetic corpus's 35-word vocabulary — the gate must
    // gate something).
    Q("tx_decontam", (s, d) => {
      def grams8(df: org.apache.spark.sql.DataFrame, idCol: String) = df
        .withColumn("words", split(col("text"), " "))
        .select(col("doc_id").as(idCol),
          // CASE guard: Spark's sequence(1, n) DESCENDS for n < 1 (DuckDB's
          // range is empty) — docs under 4 words must yield no shingles
          explode(expr(
            """CASE WHEN size(words) >= 4
               THEN transform(sequence(1, size(words) - 3),
                    i -> concat_ws(' ', slice(words, i, 4)))
               ELSE array() END""")).as("g"))
        .distinct()
      val docs = Q.spreadSmallScan(tbl(s, d, "documents"))
      val ev = grams8(docs.filter(col("doc_id") % 100 === 0), "eval_id")
      val tr = grams8(docs.filter(col("doc_id") % 100 =!= 0), "doc_id")
      tr.join(broadcast(ev), "g")
        .groupBy("doc_id", "eval_id")
        .agg(count(lit(1)).as("n_shared"))
    }, Some("""
      WITH g8 AS (
        SELECT doc_id, unnest(list_transform(
                 range(1, greatest(len(words) - 3, 0) + 1),
                 i -> array_to_string(words[i : i + 3], ' '))) AS g
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)),
      gd AS (SELECT DISTINCT doc_id, g FROM g8),
      ev AS (SELECT doc_id AS eval_id, g FROM gd WHERE eval_id % 100 = 0),
      tr AS (SELECT doc_id, g FROM gd WHERE doc_id % 100 != 0)
      SELECT t.doc_id, e.eval_id, count(*) AS n_shared
      FROM tr t JOIN ev e ON t.g = e.g
      GROUP BY t.doc_id, e.eval_id""")),

    // -- decontamination n-gram-size sweep -----------------------------------
    // THE methodological knob of eval decontamination, measured instead
    // of assumed: exact n-gram overlap at n = 4 (aggressive — catches
    // paraphrase-scale overlap and false-positives common phrases),
    // n = 8 (the house gate's neighborhood) and n = 13 (the GPT-3 paper's
    // canonical exact-match setting, near-zero false positives). One
    // tokenized pass; each n is a generator + distinct + gram equi-join
    // against the broadcast eval side, folded to contaminated-doc and
    // contaminated-pair counts. Reading the three rows together is how
    // the threshold is actually chosen.
    Q("tx_decontam_sweep", (s, d) => {
      val docs = Q.spreadSmallScan(tbl(s, d, "documents"))
        .withColumn("words", split(col("text"), " "))
      def gramsN(df: org.apache.spark.sql.DataFrame, idCol: String, n: Int) = df
        .select(col("doc_id").as(idCol),
          explode(expr(
            s"""CASE WHEN size(words) >= $n
                THEN transform(sequence(1, size(words) - ${n - 1}),
                     i -> concat_ws(' ', slice(words, i, $n)))
                ELSE array() END""")).as("g"))
        .distinct()
      Seq(4, 8, 13).map { n =>
        val ev = gramsN(docs.filter(col("doc_id") % 100 === 0), "eval_id", n)
        val tr = gramsN(docs.filter(col("doc_id") % 100 =!= 0), "doc_id", n)
        tr.join(broadcast(ev), "g")
          .select("doc_id", "eval_id").distinct()
          .groupBy()
          .agg(countDistinct(col("doc_id")).as("n_contam_docs"),
            count(lit(1)).as("n_pairs"))
          .select(lit(n.toLong).as("n"), col("n_contam_docs"), col("n_pairs"))
      }.reduce(_ unionByName _)
    }, Some(
      Seq(4, 8, 13).map { n =>
        s"""
        SELECT CAST($n AS BIGINT) AS n,
               count(DISTINCT doc_id) AS n_contam_docs,
               count(*) AS n_pairs
        FROM (
          SELECT DISTINCT t.doc_id, e.eval_id
          FROM (
            SELECT DISTINCT doc_id, g FROM (
              SELECT doc_id, unnest(list_transform(
                       range(1, greatest(len(words) - ${n - 1}, 0) + 1),
                       i -> array_to_string(words[i : i + ${n - 1}], ' '))) AS g
              FROM (SELECT doc_id, string_split(text, ' ') AS words
                    FROM documents))
            WHERE doc_id % 100 != 0) t
          JOIN (
            SELECT DISTINCT doc_id AS eval_id, g FROM (
              SELECT doc_id, unnest(list_transform(
                       range(1, greatest(len(words) - ${n - 1}, 0) + 1),
                       i -> array_to_string(words[i : i + ${n - 1}], ' '))) AS g
              FROM (SELECT doc_id, string_split(text, ' ') AS words
                    FROM documents))
            WHERE eval_id % 100 = 0) e
          ON t.g = e.g)"""
      }.mkString("\n        UNION ALL\n"))),

    // -- within-document repetition signals (Gopher/MassiveText) -------------
    // The repetition quality gates from the Gopher filtering recipe: top-word
    // frequency and duplicate-bigram mass, per document. All counts are
    // integers; each ratio is ONE IEEE division of exact integers, so the
    // doubles agree bit-for-bit across engines. One explode + per-doc hash
    // aggregates — map-side combinable, no window, linear at any scale.
    Q("tx_repetition", (s, d) => {
      val docs = Q.spreadSmallScan(tbl(s, d, "documents"))
      val words = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      val wstats = words.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        .groupBy("doc_id")
        .agg(sum("tf").as("n_words"), max("tf").as("max_tf"),
          count(lit(1)).as("n_distinct"))
      val bi = docs
        .withColumn("words", split(col("text"), " "))
        .select(col("doc_id"),
          explode(expr(
            """CASE WHEN size(words) >= 2
               THEN transform(sequence(1, size(words) - 1),
                    i -> concat_ws(' ', element_at(words, i), element_at(words, i + 1)))
               ELSE array() END""")).as("b"))
        .groupBy("doc_id", "b").agg(count(lit(1)).as("bf"))
        .groupBy("doc_id")
        .agg(sum("bf").as("n_bigrams"),
          sum(col("bf") - 1).as("dup_bigrams"))
      wstats.join(bi, "doc_id")
        .select(col("doc_id"), col("n_words"), col("max_tf"), col("n_distinct"),
          col("n_bigrams"), col("dup_bigrams"),
          (col("max_tf").cast("double") / col("n_words").cast("double"))
            .as("top_word_ratio"),
          (col("dup_bigrams").cast("double") / col("n_bigrams").cast("double"))
            .as("dup_bigram_ratio"))
    }, Some("""
      WITH wrd AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      tf AS (SELECT doc_id, w, count(*) AS tf FROM wrd GROUP BY doc_id, w),
      ws AS (
        SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_words,
               CAST(max(tf) AS BIGINT) AS max_tf,
               count(*) AS n_distinct
        FROM tf GROUP BY doc_id),
      bg AS (
        SELECT doc_id, unnest(list_transform(range(1, len(words)),
                 i -> words[i] || ' ' || words[i+1])) AS b
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)),
      bf AS (SELECT doc_id, b, count(*) AS bf FROM bg GROUP BY doc_id, b),
      bs AS (
        SELECT doc_id, CAST(sum(bf) AS BIGINT) AS n_bigrams,
               CAST(sum(bf - 1) AS BIGINT) AS dup_bigrams
        FROM bf GROUP BY doc_id)
      SELECT w.doc_id, w.n_words, w.max_tf, w.n_distinct,
             b.n_bigrams, b.dup_bigrams,
             CAST(w.max_tf AS DOUBLE) / CAST(w.n_words AS DOUBLE)
               AS top_word_ratio,
             CAST(b.dup_bigrams AS DOUBLE) / CAST(b.n_bigrams AS DOUBLE)
               AS dup_bigram_ratio
      FROM ws w JOIN bs b ON w.doc_id = b.doc_id""")),

    // -- BM25 term scoring ----------------------------------------------------
    // Okapi BM25 (k1=1.2, b=0.75) as EXACT rational arithmetic: with
    // k1=6/5, b=3/4 and avgdl=L/N (L = corpus word count), the term factor
    //   tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
    // reduces to 22*tf*L / (10*tf*L + 3*L + 9*dl*N) and the Robertson idf
    // ratio (N-df+0.5)/(df+0.5) to (2N-2df+1)/(2df+1) — so the score is one
    // integer numerator, one integer denominator, and ONE IEEE division,
    // bit-identical in both engines (the usual ln() is dropped the same way
    // tx_tfidf drops it: monotone, so ranking is unchanged). Ordering by the
    // double is safe BECAUSE it is exactly rounded from identical integers.
    // Top-5 terms per document; corpus totals reach the plan as a broadcast
    // 1-row aggregate.
    Q("tx_bm25", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      // NO spread here (measured, r17): unlike tx_tfidf, the four
      // consumers of `words` (tf, dl, df-via-tf, corpus totals) each
      // materialize the spread exchange subtree, and the quiet bench read
      // the spread form at 1.5x (1.39 -> 2.1-2.4 s across three runs /
      // probes) — the explode here is cheap enough that scan-parallelism
      // never repays four extra exchange materializations.
      val docs = tbl(s, d, "documents")
      val words = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dl = words.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val nl = words.agg(
        countDistinct(col("doc_id")).as("nn"), count(lit(1)).as("ll"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("bm25").desc, col("term").asc)
      tf.join(dl, "doc_id").join(df, "term").crossJoin(broadcast(nl))
        .withColumn("bm25",
          (lit(22L) * col("tf") * col("ll")
            * (lit(2L) * col("nn") - lit(2L) * col("df") + 1L)).cast("double")
          / ((lit(10L) * col("tf") * col("ll") + lit(3L) * col("ll")
              + lit(9L) * col("dl") * col("nn"))
             * (lit(2L) * col("df") + 1L)).cast("double"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .select(col("doc_id"), col("term"), col("tf"), col("dl"), col("df"),
          col("rn"), col("bm25"))
    }, Some("""
      WITH wrd AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM wrd GROUP BY doc_id, term),
      dl AS (SELECT doc_id, count(*) AS dl FROM wrd GROUP BY doc_id),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      nl AS (SELECT count(DISTINCT doc_id) AS nn, count(*) AS ll FROM wrd)
      , scored AS (
        SELECT t.doc_id, t.term, t.tf, l.dl, d.df,
               CAST(22 * t.tf * ll * (2 * nn - 2 * d.df + 1) AS DOUBLE)
               / CAST((10 * t.tf * ll + 3 * ll + 9 * l.dl * nn)
                      * (2 * d.df + 1) AS DOUBLE) AS bm25
        FROM tf t JOIN dl l ON t.doc_id = l.doc_id
             JOIN df d ON t.term = d.term, nl)
      SELECT doc_id, term, tf, dl, df, rn, bm25 FROM (
        SELECT doc_id, term, tf, dl, df, bm25,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY bm25 DESC, term ASC) AS rn
        FROM scored)
      WHERE rn <= 5""")),

    // -- ranked-window suite --------------------------------------------------
    // The remaining SQL window functions in one gated query: rank, ntile,
    // percent_rank, cume_dist, lag. Ordering is (double, key) — the key
    // tiebreak makes every rank total, and percent_rank/cume_dist are single
    // IEEE divisions of small exact integers, identical in both engines.
    Q("q23_window_suite", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      // NULLS LAST pinned explicitly on BOTH sides: Spark's ASC default is
      // nulls-first, DuckDB's is nulls-last — unpinned, every window rank
      // silently shifts the moment a price is missing
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").asc_nulls_last, col("o_orderkey"))
      tbl(s, d, "orders").filter(col("o_orderkey") % 20 === 0)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .withColumn("rnk", rank().over(w).cast("long"))
        .withColumn("ntl", ntile(4).over(w).cast("long"))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .withColumn("prev_price",
          coalesce(lag(col("o_totalprice"), 1).over(w), lit(-1.0d)))
    }, Some("""
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             rank() OVER w AS rnk,
             ntile(4) OVER w AS ntl,
             percent_rank() OVER w AS pr,
             cume_dist() OVER w AS cd,
             coalesce(lag(o_totalprice) OVER w, -1.0) AS prev_price
      FROM orders WHERE o_orderkey % 20 = 0
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice NULLS LAST, o_orderkey)""")),

    // -- semi-structured VARIANT path ----------------------------------------
    // Spark 4's VARIANT type over the events props JSON: parse once into
    // the binary variant encoding, path-extract with variant_get (typed,
    // codegen'd — no per-row regex), aggregate. The oracle uses DuckDB's
    // JSON path operator over the same strings. q15_json keeps the
    // regex-extraction formulation; this is the engine-native one.
    Q("q25_variant", (s, d) => {
      tbl(s, d, "events")
        .withColumn("k",
          expr("variant_get(parse_json(props), '$.k', 'bigint')"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
    }, Some("""
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
             min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
             max(CAST(props->>'$.k' AS BIGINT)) AS max_k
      FROM events GROUP BY event_type""")),

    // -- full CUBE with grouping ids -----------------------------------------
    // q13_rollup's lattice sibling: all four grouping sets of
    // (status, priority) plus the grouping id that disambiguates real NULLs
    // from subtotal rows — the OLAP primitive a reporting layer needs.
    Q("q24_cube", (s, d) => {
      val base = tbl(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), grouping_id().cast("long").as("gid"))
      // SQL standard: CUBE's () grouping set aggregates the whole input, so
      // an empty table still yields the grand-total row (gid 3, count 0);
      // Spark's Expand emits nothing on zero rows — restore the standard row.
      // Probe the raw TABLE (LIMIT-1 scan), not `base`: probing the cube
      // would run the Expand + full aggregation twice per invocation.
      if (tbl(s, d, "orders").limit(1).isEmpty)
        base.sparkSession.sql(
          """SELECT CAST(NULL AS STRING) AS o_orderstatus,
                    CAST(NULL AS STRING) AS o_orderpriority,
                    CAST(0 AS BIGINT) AS n, CAST(3 AS BIGINT) AS gid""")
      else base
    }, Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             CAST(grouping(o_orderstatus) * 2
                  + grouping(o_orderpriority) AS BIGINT) AS gid
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    // -- SCD2 interval construction ------------------------------------------
    // The warehouse dimension-versioning pass: per user, collapse runs of
    // unchanged event_type into versions with [valid_from, valid_to)
    // intervals (no-change suppression + lead-closed intervals). All three
    // windows and the aggregate share ONE partitioning on user_id — a single
    // shuffle no matter how many versions a user has.
    Q("q22_scd2", (s, d) => scd2(s, d), Some("""
      WITH ev AS (
        SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id
        FROM events WHERE ts IS NOT NULL),
      flagged AS (
        SELECT user_id, event_type, ts_ms, event_id,
               CASE WHEN lag(event_type) OVER w IS NULL
                      OR lag(event_type) OVER w != event_type
                    THEN 1 ELSE 0 END AS chg
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
      versioned AS (
        SELECT user_id, event_type, ts_ms,
               CAST(sum(chg) OVER (PARTITION BY user_id
                                   ORDER BY ts_ms, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS version
        FROM flagged),
      runs AS (
        SELECT user_id, version, min(event_type) AS event_type,
               min(ts_ms) AS valid_from, count(*) AS n_events
        FROM versioned GROUP BY user_id, version)
      SELECT user_id, version, event_type, valid_from,
             coalesce(lead(valid_from) OVER (PARTITION BY user_id
                                             ORDER BY version),
                      -1) AS valid_to,
             n_events
      FROM runs""")),

    // -- ordered conversion funnel ------------------------------------------
    // Per user, how far through signup -> view -> click -> purchase the
    // user progressed, where each stage counts only if its FIRST occurrence
    // follows the previous stage's first occurrence (the product-analytics
    // funnel). One user-keyed conditional aggregate — map-side combinable,
    // no windows, no self-joins — versus the naive 4-way time-ordered
    // self-join; at 100 TB this is one shuffle of 4 longs per user.
    Q("q26_funnel", (s, d) => {
      tbl(s, d, "events")
        .select(col("user_id"), col("event_type"),
          Q.tsNanos(col("ts")).as("t"))
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "signup", col("t"))).as("t_signup"),
          min(when(col("event_type") === "view", col("t"))).as("t_view"),
          min(when(col("event_type") === "click", col("t"))).as("t_click"),
          min(when(col("event_type") === "purchase", col("t"))).as("t_purchase"))
        .withColumn("reached", expr("""
          CASE WHEN t_signup IS NULL THEN 0
               WHEN t_view IS NULL OR t_view < t_signup THEN 1
               WHEN t_click IS NULL OR t_click < t_view THEN 2
               WHEN t_purchase IS NULL OR t_purchase < t_click THEN 3
               ELSE 4 END"""))
        .select(col("user_id"), col("reached"))
    }, Some("""
      WITH f AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN epoch_ns(ts) END) AS t_signup,
               min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS t_view,
               min(CASE WHEN event_type = 'click' THEN epoch_ns(ts) END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END) AS t_purchase
        FROM events GROUP BY user_id)
      SELECT user_id,
             CASE WHEN t_signup IS NULL THEN 0
                  WHEN t_view IS NULL OR t_view < t_signup THEN 1
                  WHEN t_click IS NULL OR t_click < t_view THEN 2
                  WHEN t_purchase IS NULL OR t_purchase < t_click THEN 3
                  ELSE 4 END AS reached
      FROM f""")),

    // -- triangle counting on the near-dup graph -----------------------------
    // Cluster-cohesion analytics over the minhash candidate graph: every
    // triangle (a < b < c, all three edges present). Two equi-joins over the
    // edge relation — the standard edge-partitioned distributed shape; the
    // ordered-edge orientation (id_a < id_b) means each triangle is found
    // exactly once, no post-dedup.
    Q("dd_triangles", (s, d) => {
      val e = TextOps.minhashCand(s, d).persist()
      try graft.Caching.releaseAfterAction(
        e.as("e1").join(e.as("e2"), col("e1.id_b") === col("e2.id_a"))
          .join(e.as("e3"),
            col("e1.id_a") === col("e3.id_a") &&
              col("e2.id_b") === col("e3.id_b"))
          .select(col("e1.id_a").as("a"), col("e1.id_b").as("b"),
            col("e2.id_b").as("c")),
        e)
      catch {
        case ex: Throwable => e.unpersist(blocking = false); throw ex
      }
    }, Some(TextOps.MINHASH_CAND_SQL + """
      SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
      FROM cand e1 JOIN cand e2 ON e1.id_b = e2.id_a
           JOIN cand e3 ON e1.id_a = e3.id_a AND e2.id_b = e3.id_b""")),

    // -- global clustering coefficient ---------------------------------------
    // The cohesion statistic over the same near-dup graph: C = 3T / W
    // with T the triangle count (dd_triangles' ordered two-join, folded
    // to one row) and W the open-wedge count Σ_v deg·(deg−1)/2 — deg·
    // (deg−1) is always even, so the halving is exact integer division.
    // High C on a dedup candidate graph means candidates arrive in
    // cliques (whole duplicated families), low C means chains — the
    // signal that decides whether transitive clustering (dd_components)
    // will over-merge. Everything folds to exact-int scalars; the one
    // float is the final division.
    Q("gr_clustering", (s, d) => {
      val e = TextOps.minhashCand(s, d)
      val tri = e.as("e1").join(e.as("e2"), col("e1.id_b") === col("e2.id_a"))
        .join(e.as("e3"),
          col("e1.id_a") === col("e3.id_a") &&
            col("e2.id_b") === col("e3.id_b"))
        .groupBy().agg(count(lit(1)).as("n_tri"))
      val deg = e.select(col("id_a").as("v"))
        .unionByName(e.select(col("id_b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
      val wed = deg.groupBy()
        .agg(sum(expr("deg * (deg - 1) div 2")).as("n_wedges"),
          count(lit(1)).as("n_nodes"))
      graft.Caching.releaseAfterAction(
        e.groupBy().agg(count(lit(1)).as("n_edges"))
          .crossJoin(broadcast(tri)).crossJoin(broadcast(wed))
          // try_divide: a wedge-free candidate graph (single edge, isolated
          // pairs) yields NULL like DuckDB's x/0, not an ANSI error
          .withColumn("c_global", expr("try_divide(3 * n_tri, n_wedges)"))
          .select("n_edges", "n_tri", "n_wedges", "n_nodes", "c_global"),
        e)
    }, Some(TextOps.MINHASH_CAND_SQL + """,
      tri AS (
        SELECT count(*) AS n_tri
        FROM cand e1 JOIN cand e2 ON e1.id_b = e2.id_a
             JOIN cand e3 ON e1.id_a = e3.id_a AND e2.id_b = e3.id_b),
      deg AS (
        SELECT v, count(*) AS deg FROM (
          SELECT id_a AS v FROM cand UNION ALL SELECT id_b FROM cand)
        GROUP BY 1),
      wed AS (
        SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges,
               count(*) AS n_nodes
        FROM deg),
      ed AS (SELECT count(*) AS n_edges FROM cand)
      SELECT n_edges, n_tri, n_wedges, n_nodes,
             3 * n_tri / n_wedges AS c_global
      FROM ed, tri, wed""")),

    // -- composed C4-style filter decision -----------------------------------
    // The actual keep/drop gate a curation pipeline emits: every document
    // scored against word-count bounds, top-word concentration, and
    // duplicate-bigram mass (the Gopher/C4 rule family), with the FIRST
    // failing rule recorded. All thresholds compare integers cross-multiplied
    // (20*max_tf vs 3*n_words etc.) so no ratio ever materializes — the
    // decision is exact in both engines. One explode + per-doc aggregates.
    Q("tx_c4_filter", (s, d) => {
      val docs = Q.spreadSmallScan(tbl(s, d, "documents"))
      val words = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      val tf = words.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        .groupBy("doc_id")
        .agg(sum("tf").as("n_words"), max("tf").as("max_tf"))
      val bi = docs.withColumn("words", split(col("text"), " "))
        .select(col("doc_id"), explode(expr(
          """CASE WHEN size(words) >= 2
             THEN transform(sequence(1, size(words) - 1),
                  i -> concat_ws(' ', element_at(words, i), element_at(words, i + 1)))
             ELSE array() END""")).as("b"))
        .groupBy("doc_id", "b").agg(count(lit(1)).as("bf"))
        .groupBy("doc_id")
        .agg(sum("bf").as("n_bigrams"), sum(col("bf") - 1).as("dup_bigrams"))
      tf.join(bi, "doc_id")
        .withColumn("reason",
          when(col("n_words") < 20, "too_short")
            .when(col("n_words") > 500, "too_long")
            // top_word_ratio > 0.15  <=>  20 * max_tf > 3 * n_words
            .when(col("max_tf") * 20 > col("n_words") * 3, "top_word_conc")
            // dup_bigram_ratio > 0.33 <=> 3 * dup > n_bigrams
            .when(col("dup_bigrams") * 3 > col("n_bigrams"), "dup_bigrams")
            .otherwise("ok"))
        .select(col("doc_id"), col("n_words"), col("max_tf"),
          col("dup_bigrams"), (col("reason") === "ok").as("keep"),
          col("reason"))
    }, Some("""
      WITH wrd AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      tfx AS (SELECT doc_id, w, count(*) AS tf FROM wrd GROUP BY doc_id, w),
      ws AS (
        SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_words,
               CAST(max(tf) AS BIGINT) AS max_tf
        FROM tfx GROUP BY doc_id),
      bg AS (
        SELECT doc_id, unnest(list_transform(range(1, len(words)),
                 i -> words[i] || ' ' || words[i+1])) AS b
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)),
      bfx AS (SELECT doc_id, b, count(*) AS bf FROM bg GROUP BY doc_id, b),
      bs AS (
        SELECT doc_id, CAST(sum(bf) AS BIGINT) AS n_bigrams,
               CAST(sum(bf - 1) AS BIGINT) AS dup_bigrams
        FROM bfx GROUP BY doc_id),
      scored AS (
        SELECT w.doc_id, w.n_words, w.max_tf, b.n_bigrams, b.dup_bigrams,
               CASE WHEN w.n_words < 20 THEN 'too_short'
                    WHEN w.n_words > 500 THEN 'too_long'
                    WHEN w.max_tf * 20 > w.n_words * 3 THEN 'top_word_conc'
                    WHEN b.dup_bigrams * 3 > b.n_bigrams THEN 'dup_bigrams'
                    ELSE 'ok' END AS reason
        FROM ws w JOIN bs b ON w.doc_id = b.doc_id)
      SELECT doc_id, n_words, max_tf, dup_bigrams,
             reason = 'ok' AS keep, reason
      FROM scored""")),

    // -- PII redaction --------------------------------------------------------
    // The scrubbing pass a compliant pipeline runs before training: detect
    // and redact emails and phone-shaped tokens. PII is INJECTED
    // deterministically (the synthetic corpus has none), then both engines
    // scrub with the same character-class-only regexes — no \\d, \\b, or
    // lookaround, so Java regex and RE2 cannot disagree. The fingerprint
    // pins the full scrubbed text. One projection per row: no shuffle.
    Q("tx_pii_scrub", (s, d) => {
      val emailPat = "[a-z0-9]+@[a-z]+\\.[a-z]+"
      val phonePat = "[0-9]{3}-[0-9]{4}"
      tbl(s, d, "documents")
        .withColumn("text2", concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@mail.example now"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" call 555-"),
              (col("doc_id") % 9000 + 1000).cast("string"),
              lit(" today"))).otherwise(lit(""))))
        .select(col("doc_id"),
          regexp_count(col("text2"), lit(emailPat)).cast("long").as("n_emails"),
          regexp_count(col("text2"), lit(phonePat)).cast("long").as("n_phones"),
          md5(regexp_replace(
            regexp_replace(col("text2"), emailPat, "<EMAIL>"),
            phonePat, "<PHONE>")).as("fp"))
    }, Some("""
      WITH aug AS (
        SELECT doc_id, text ||
          CASE WHEN doc_id % 7 = 0
               THEN ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@mail.example now' ELSE '' END ||
          CASE WHEN doc_id % 11 = 0
               THEN ' call 555-' || CAST(doc_id % 9000 + 1000 AS VARCHAR)
                    || ' today' ELSE '' END AS text2
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(text2,
               '[a-z0-9]+@[a-z]+\.[a-z]+')) AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(text2,
               '[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
             md5(regexp_replace(regexp_replace(text2,
               '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
               '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS fp
      FROM aug""")),

    // -- deterministic train/val/test split ----------------------------------
    // Split assignment is a pure function of the doc id (md5 head byte:
    // <230 train, <243 val, else test ~= 90/5/5), so it is reproducible,
    // join-free, and any shard of the corpus can be split independently —
    // the property that matters when the corpus is 100 TB. Output is the
    // per-(lang, source, split) composition table.
    Q("tx_sample_split", (s, d) => {
      tbl(s, d, "documents")
        .withColumn("b", expr(bucket("doc_id")))
        .withColumn("split",
          when(col("b") < 230, "train").when(col("b") < 243, "val")
            .otherwise("test"))
        .groupBy("lang", "source", "split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
    }, Some(s"""
      WITH b AS (
        SELECT lang, source, ${bucketSql("doc_id")} AS b, n_chars
        FROM documents)
      SELECT lang, source,
             CASE WHEN b < 230 THEN 'train'
                  WHEN b < 243 THEN 'val' ELSE 'test' END AS split,
             count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM b GROUP BY 1, 2, 3""")),

    // -- DSIR-style importance weights (data selection for language models)
    // Every document is scored by how target-like its hashed-n-gram profile
    // is: per bigram g, the importance ratio nt(g)/ns(g) between the target
    // distribution (here lang='en' — the domain being up-sampled) and the
    // full-corpus distribution, doc score = sum over the doc's bigram
    // occurrences of the scaled-integer ratio (nt*1e6 div ns). Shape at
    // 100 TB: one explode, per-(doc,gram) pre-aggregate (map-side
    // combinable), two gram-keyed stat aggregates off the CACHED per-doc
    // relation, one gram equi-join back, one per-doc sum. Production DSIR
    // hashes grams into 2^20 buckets to bound the stat tables —
    // pmod(xxhash64(g), 1048576) swaps in for `g` with the shape unchanged;
    // the un-hashed key keeps the oracle engine-exact (cf. dd_substring).
    // Docs with <2 tokens carry no grams and score 0 via the left join.
    Q("tx_dsir", (s, d) => {
      val dg = Q.spreadSmallScan(tbl(s, d, "documents"))
        .withColumn("words", split(col("text"), " "))
        .select(col("doc_id"), col("lang"), explode(expr(
          """CASE WHEN size(words) >= 2 THEN
               transform(sequence(1, size(words) - 1),
                 i -> concat_ws(' ', element_at(words, i),
                                element_at(words, i + 1)))
             ELSE array() END""")).as("g"))
        .groupBy("doc_id", "lang", "g").agg(count(lit(1)).as("c"))
      val tgt = dg.filter(col("lang") === "en")
        .groupBy("g").agg(sum("c").as("nt"))
      val alls = dg.groupBy("g").agg(sum("c").as("ns"))
      val ratio = alls.join(tgt, Seq("g"), "left")
        .select(col("g"),
          expr("(coalesce(nt, 0) * 1000000) div ns").as("r"))
      val scored = dg.join(ratio, "g").groupBy("doc_id")
        .agg(sum(expr("c * r")).cast("long").as("score"),
          sum("c").cast("long").as("n_grams"))
      val out = tbl(s, d, "documents").select(col("doc_id"))
        .join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("score"), lit(0L)).as("score"))
      graft.Caching.releaseAfterAction(out, dg)
    }, Some("""
      WITH bg AS (
        SELECT doc_id, lang, x.toks[i] || ' ' || x.toks[i + 1] AS g
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks
              FROM documents) x,
             UNNEST(generate_series(1, len(x.toks) - 1)) AS u(i)),
      dg AS (SELECT doc_id, lang, g, CAST(count(*) AS BIGINT) AS c
             FROM bg GROUP BY 1, 2, 3),
      tgt AS (SELECT g, CAST(sum(c) AS BIGINT) AS nt
              FROM dg WHERE lang = 'en' GROUP BY g),
      alls AS (SELECT g, CAST(sum(c) AS BIGINT) AS ns FROM dg GROUP BY g),
      ratio AS (SELECT a.g, (coalesce(t.nt, 0) * 1000000) // a.ns AS r
                FROM alls a LEFT JOIN tgt t ON a.g = t.g),
      sc AS (SELECT dg.doc_id, CAST(sum(dg.c * ratio.r) AS BIGINT) AS score,
                    CAST(sum(dg.c) AS BIGINT) AS n_grams
             FROM dg JOIN ratio ON dg.g = ratio.g GROUP BY 1)
      SELECT d.doc_id, coalesce(sc.n_grams, 0) AS n_grams,
             coalesce(sc.score, 0) AS score
      FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""")),

    // -- perplexity-bucket sampling (n-gram LM scoring) -----------------------
    // The KenLM-shaped quality signal: a bigram language model is trained on
    // the corpus itself (conditional probability c(w1 w2)/c(w1) in scaled-
    // integer ppm), every document is scored by its mean per-bigram
    // probability, and docs land in perplexity buckets — the
    // sample-by-perplexity-band selection a pretraining pipeline runs.
    // Thresholds bracket the corpus median (~33.9k ppm). Shape at 100 TB:
    // the LM relations (unigram + bigram counts) are vocab-sized map-side-
    // combined aggregates off the cached per-(doc,bigram) relation; scoring
    // is one bigram-keyed equi-join back plus a per-doc sum. A larger-order
    // LM swaps the key width, not the shape.
    Q("tx_perplexity", (s, d) => {
      val dg = Q.spreadSmallScan(tbl(s, d, "documents"))
        .withColumn("words", split(col("text"), " "))
        .select(col("doc_id"), explode(expr(
          """CASE WHEN size(words) >= 2 THEN
               transform(sequence(1, size(words) - 1),
                 i -> struct(element_at(words, i) AS w1,
                             element_at(words, i + 1) AS w2))
             ELSE array() END""")).as("b"))
        .groupBy(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .agg(count(lit(1)).as("c"))
      val uni = tbl(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cu"))
      val bgc = dg.groupBy("w1", "w2").agg(sum("c").as("cb"))
      val ratio = bgc.join(uni, col("w1") === col("word"))
        .select(col("w1"), col("w2"), expr("(cb * 1000000) div cu").as("r"))
      val out = dg.join(ratio, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(expr("sum(c * r) div sum(c)").as("mean_ppm"),
          sum("c").cast("long").as("n_bigrams"))
        .select(col("doc_id"), col("n_bigrams"), col("mean_ppm"),
          when(col("mean_ppm") > 34500, "low_ppl")
            .when(col("mean_ppm") >= 33000, "mid_ppl")
            .otherwise("high_ppl").as("bucket"))
      graft.Caching.releaseAfterAction(out, dg)
    }, Some("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
      bg AS (SELECT doc_id, x.toks[i] AS w1, x.toks[i + 1] AS w2
             FROM w x, UNNEST(generate_series(1, len(x.toks) - 1)) AS u(i)),
      dg AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS c
             FROM bg GROUP BY 1, 2, 3),
      uni AS (SELECT word, CAST(count(*) AS BIGINT) AS cu
              FROM (SELECT unnest(string_split(text, ' ')) AS word
                    FROM documents) GROUP BY 1),
      bgc AS (SELECT w1, w2, CAST(sum(c) AS BIGINT) AS cb
              FROM dg GROUP BY 1, 2),
      ratio AS (SELECT b.w1, b.w2, (b.cb * 1000000) // u.cu AS r
                FROM bgc b JOIN uni u ON b.w1 = u.word),
      pd AS (SELECT dg.doc_id,
                    CAST(sum(dg.c * ratio.r) // sum(dg.c) AS BIGINT) AS mean_ppm,
                    CAST(sum(dg.c) AS BIGINT) AS n_bigrams
             FROM dg JOIN ratio ON dg.w1 = ratio.w1 AND dg.w2 = ratio.w2
             GROUP BY 1)
      SELECT doc_id, n_bigrams, mean_ppm,
             CASE WHEN mean_ppm > 34500 THEN 'low_ppl'
                  WHEN mean_ppm >= 33000 THEN 'mid_ppl'
                  ELSE 'high_ppl' END AS bucket
      FROM pd""")),

    // -- the whole curation pipeline in one query ----------------------------
    // What a user actually runs: language gate -> quality gate (Gopher-style
    // length + top-word mass) -> exact dedup (min-id keep) -> fuzzy dedup
    // (LSH candidates + Jaccard >= 0.5, higher id drops) -> benchmark
    // decontamination (any shared distinct 4-gram with the eval stratum).
    // Every stage's predicate is computed independently over the full train
    // stratum (deterministic — no order dependence between stages); the
    // verdict is the FIRST failing stage in pipeline order. Output: one row
    // per train doc with its token count and verdict — the corpus data
    // card. Fuzzy signatures ride the fused MinHashSlices scan-stage
    // expression; verify joins ship 8-byte shingle hashes; every stage is
    // scan + hash-aggregate + bounded-key equi-join, so the one-query
    // pipeline is exactly as 100 TB-shaped as its pieces.
    Q("tx_curate_full", (s, d) => {
      import graft.functions.MinHashSlices.minhash_slices
      val docs =
        Q.spreadSmallScan(tbl(s, d, "documents").filter(col("doc_id") % 100 =!= 0))
      val evd = tbl(s, d, "documents").filter(col("doc_id") % 100 === 0)
      val st = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(sum("c").as("nw"), max("c").as("mtf"))
      val hx = docs.select(col("doc_id"), md5(col("text")).as("h"))
      val dupx = hx.join(hx.groupBy("h").agg(min("doc_id").as("k")), "h")
        .filter(col("doc_id") =!= col("k"))
        .select(col("doc_id")).distinct().withColumn("fx", lit(1))
      val mins = docs
        .select(col("doc_id"), minhash_slices(col("text")).as("mh"))
        .filter(col("mh").isNotNull)
        .select(col("doc_id") +:
          (0 until 8).map(j => col("mh").getItem(j).as(s"mh$j")): _*)
      val cand = TextOps.candFromMins(mins)
      val shd = docs.withColumn("words", split(col("text"), " "))
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(words) - 2),
             i -> concat_ws(' ', element_at(words, i),
                            element_at(words, i + 1), element_at(words, i + 2)))"""))
          .as("shingle")).distinct()
      val dsh = shd.select(col("doc_id"), xxhash64(col("shingle")).as("hs"))
      val sizes = shd.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val dupf = cand
        .join(dsh.select(col("doc_id").as("id_a"), col("hs")), "id_a")
        .join(dsh.select(col("doc_id").as("id_b"), col("hs")), Seq("id_b", "hs"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
        .filter(col("inter") * 2 >= col("na") + col("nb") - col("inter"))
        .select(col("id_b").as("doc_id")).distinct().withColumn("ff", lit(1))
      def g4(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("words", split(col("text"), " "))
        .select(col("doc_id"), explode(expr(
          """CASE WHEN size(words) >= 4
             THEN transform(sequence(1, size(words) - 3),
                  i -> concat_ws(' ', slice(words, i, 4)))
             ELSE array() END""")).as("g"))
        .distinct()
      val cont = g4(docs)
        .join(g4(evd).select(col("g")).distinct(), "g")
        .select(col("doc_id")).distinct().withColumn("fc", lit(1))
      val out = docs.select(col("doc_id"), col("lang")).join(st, "doc_id")
        .join(dupx, Seq("doc_id"), "left")
        .join(dupf, Seq("doc_id"), "left")
        .join(cont, Seq("doc_id"), "left")
        .select(col("doc_id"), col("nw").cast("long").as("n_words"),
          when(!col("lang").isin("en", "es", "de", "fr"), "lang")
            .when(col("nw") < 20 || col("mtf") * 5 >= col("nw"), "quality")
            .when(col("fx").isNotNull, "dup_exact")
            .when(col("ff").isNotNull, "dup_fuzzy")
            .when(col("fc").isNotNull, "contaminated")
            .otherwise("kept").as("verdict"))
      graft.Caching.releaseAfterAction(out, shd)
    }, Some(s"""
      WITH tc AS (SELECT doc_id, lang, text FROM documents
                  WHERE doc_id % 100 != 0),
      st AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS nw,
               CAST(max(c) AS BIGINT) AS mtf
        FROM (SELECT doc_id, w, count(*) AS c
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                    FROM tc) GROUP BY 1, 2)
        GROUP BY doc_id),
      hx AS (SELECT doc_id, md5(text) AS h FROM tc),
      dupx AS (
        SELECT DISTINCT hx.doc_id FROM hx
        JOIN (SELECT h, min(doc_id) AS k FROM hx GROUP BY h) m ON hx.h = m.h
        WHERE hx.doc_id != m.k),
      sh AS (
        SELECT doc_id, unnest(list_transform(range(1, len(words) - 1),
                 i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
               AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM tc)),
      shd AS (SELECT DISTINCT doc_id, shingle FROM sh),
      mins AS (
        SELECT doc_id,
               ${TextOps.MINHASH_MINS_SQL}
        FROM shd GROUP BY doc_id),
      sig AS (
        SELECT doc_id, 0 AS band, mh0 || mh1 AS bandval FROM mins
        UNION ALL SELECT doc_id, 1, mh2 || mh3 FROM mins
        UNION ALL SELECT doc_id, 2, mh4 || mh5 FROM mins
        UNION ALL SELECT doc_id, 3, mh6 || mh7 FROM mins),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sig a JOIN sig b ON a.band = b.band AND a.bandval = b.bandval
                             AND a.doc_id < b.doc_id),
      sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                FROM shd GROUP BY doc_id),
      iv AS (SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS inter
             FROM cand c JOIN shd x ON x.doc_id = c.id_a
                         JOIN shd y ON y.doc_id = c.id_b
                                   AND y.shingle = x.shingle
             GROUP BY 1, 2),
      dupf AS (
        SELECT DISTINCT iv.id_b AS doc_id
        FROM iv JOIN sizes na ON na.doc_id = iv.id_a
                JOIN sizes nb ON nb.doc_id = iv.id_b
        WHERE iv.inter * 2 >= na.n + nb.n - iv.inter),
      g4t AS (
        SELECT DISTINCT doc_id, g FROM (
          SELECT doc_id, unnest(list_transform(
                   range(1, greatest(len(words) - 3, 0) + 1),
                   i -> array_to_string(words[i : i + 3], ' '))) AS g
          FROM (SELECT doc_id, string_split(text, ' ') AS words FROM tc))),
      g4e AS (
        SELECT DISTINCT g FROM (
          SELECT unnest(list_transform(
                   range(1, greatest(len(words) - 3, 0) + 1),
                   i -> array_to_string(words[i : i + 3], ' '))) AS g
          FROM (SELECT string_split(text, ' ') AS words FROM documents
                WHERE doc_id % 100 = 0))),
      cont AS (SELECT DISTINCT g4t.doc_id FROM g4t JOIN g4e ON g4t.g = g4e.g)
      SELECT t.doc_id, st.nw AS n_words,
             CASE WHEN t.lang NOT IN ('en', 'es', 'de', 'fr') THEN 'lang'
                  WHEN st.nw < 20 OR st.mtf * 5 >= st.nw THEN 'quality'
                  WHEN dx.doc_id IS NOT NULL THEN 'dup_exact'
                  WHEN df.doc_id IS NOT NULL THEN 'dup_fuzzy'
                  WHEN ct.doc_id IS NOT NULL THEN 'contaminated'
                  ELSE 'kept' END AS verdict
      FROM tc t JOIN st ON t.doc_id = st.doc_id
      LEFT JOIN dupx dx ON t.doc_id = dx.doc_id
      LEFT JOIN dupf df ON t.doc_id = df.doc_id
      LEFT JOIN cont ct ON t.doc_id = ct.doc_id""")))
}
