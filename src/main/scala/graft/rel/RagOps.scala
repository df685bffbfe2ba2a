package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Q.tbl

/** Retrieval/training-set preparation over `documents`: fixed-stride
  * chunking (the RAG ingestion primitive), an inverted index
  * materialization, and deterministic contrastive negative sampling.
  *
  * All three are narrow-map + single-shuffle shapes: chunking is a
  * stateless generator (explode) over each document, postings shuffle once
  * on the term, and negatives are a window over hash-salted sub-rings —
  * nothing quadratic, nothing driver-side, no UDFs.
  */
object RagOps {

  /** Chunk geometry: 64-token windows every 48 tokens (16-token overlap) —
    * the context-window slicing a RAG ingest or a packing pipeline does
    * before embedding. Shared by the Spark and oracle sides.
    */
  private val W = 64
  private val S = 48

  /** The chunk transform itself — stateless (one generator, no shuffle),
    * shared verbatim by the batch gate and the streaming twin
    * (`st_tx_chunk`): a stream of documents chunks map-side with zero
    * state, which is what makes RAG ingestion a trivially streaming
    * operator.
    */
  private[graft] def chunk(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .withColumn("w", split(col("text"), " "))
      .select(col("doc_id"), col("w"), posexplode(expr(
        s"""transform(sequence(0, CAST((size(w) - 1) DIV $S AS INT)),
            i -> md5(concat_ws(' ', slice(w, i * $S + 1, $W))))""")))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        least(lit(W), size(col("w")) - col("pos") * S).cast("long")
          .as("n_tok"),
        col("col").as("chunk_md5"))

  private[graft] val CHUNK_SQL = s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      c AS (SELECT doc_id, w,
                   unnest(range(0, (len(w) - 1) // $S + 1)) AS chunk_idx
            FROM t)
      SELECT doc_id, chunk_idx,
             least($W, len(w) - chunk_idx * $S) AS n_tok,
             md5(array_to_string(
               w[(chunk_idx * $S + 1):(chunk_idx * $S + $W)], ' ')) AS chunk_md5
      FROM c"""

  def all: Seq[Q] = Seq(

    // Fixed-stride overlapping chunks per document. Chunk starts at token
    // offsets 0, S, 2S, ... while the offset is inside the document, so a
    // doc of t tokens yields (t-1) div S + 1 chunks, the last possibly
    // short. The whole operator is one generator over the token array —
    // no shuffle at all until a downstream consumer groups; at 100 TB it
    // is embarrassingly parallel and columnar end-to-end. The md5 of each
    // reassembled chunk pins the exact token membership and order through
    // the hash gate.
    Q("tx_chunk", (s, d) => chunk(tbl(s, d, "documents")), Some(CHUNK_SQL)),

    // Inverted index materialization for the mid-frequency vocabulary
    // band — df in [n/100, 4n/5] RELATIVE to corpus size n, so the band
    // means the same thing at every scale: per term, its document
    // frequency and the SORTED posting list. Rare terms are noise,
    // everywhere-terms would make posting rows corpus-wide — the df
    // filter runs BEFORE the list aggregation, so the wide groups never
    // materialize their lists; that pre-aggregation df cut is how a
    // sharded index build bounds its skew at scale. n reaches the plan as
    // a broadcast 1-row aggregate, not a collected literal.
    Q("tx_postings", (s, d) => {
      val td = Q.spreadSmallScan(tbl(s, d, "documents"))
        .select(explode(split(col("text"), " ")).as("term"), col("doc_id"))
        .distinct()
      val n = tbl(s, d, "documents").agg(count(lit(1)).as("nn"))
      val df = td.groupBy("term").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(n))
        .filter(col("df") >= col("nn") / 100 && col("df") * 5 <= col("nn") * 4)
        .select("term", "df")
      td.join(broadcast(df), "term")
        .groupBy("term", "df")
        .agg(concat_ws(",", expr(
          "transform(sort_array(collect_list(doc_id)), x -> CAST(x AS STRING))"))
          .as("postings"))
    }, Some("""
      WITH td AS (
        SELECT DISTINCT term, doc_id FROM (
          SELECT unnest(string_split(text, ' ')) AS term, doc_id
          FROM documents)),
      n AS (SELECT count(*) AS nn FROM documents),
      df AS (SELECT term, count(*) AS df FROM td, n GROUP BY term, nn
             HAVING count(*) >= nn / 100 AND count(*) * 5 <= nn * 4)
      SELECT t.term, f.df,
             array_to_string(list(t.doc_id ORDER BY t.doc_id), ',') AS postings
      FROM td t JOIN df f ON t.term = f.term
      GROUP BY t.term, f.df""")),

    // Deterministic contrastive negative sampling: each document draws 4
    // same-source negatives (hard negatives — same domain, different
    // content) by ring adjacency. Documents are ordered by md5(doc_id)
    // inside (source, first-hex-char-of-md5) sub-rings and each doc's
    // negatives are the next 4 on its ring; md5 makes the ring order a
    // deterministic pseudo-random permutation BOTH engines compute
    // identically. The hash salt splits every source into 16 independent
    // sub-rings, so the window partitions stay bounded as a source grows —
    // at 100 TB the sort is per (source, salt) slice, never per source (a
    // production corpus would widen the salt with source size).
    // Ring tails yield < 4 negatives rather than wrapping (wrap needs a
    // second pass; the boundary loss is 4/|sub-ring| of pairs).
    Q("tx_negatives", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ring = tbl(s, d, "documents")
        .select(col("doc_id"), col("source"),
          md5(col("doc_id").cast("string")).as("r"))
        .withColumn("salt", substring(col("r"), 1, 1))
      val w = Window.partitionBy("source", "salt")
        .orderBy(col("r"), col("doc_id"))
      ring
        .select(col("doc_id") +:
          (1 to 4).map(i => lead(col("doc_id"), i).over(w).as(s"n$i")): _*)
        .select(col("doc_id"),
          posexplode(array((1 to 4).map(i => col(s"n$i")): _*)))
        .filter(col("col").isNotNull)
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("neg_rank"),
          col("col").as("neg_id"))
    }, Some("""
      WITH ring AS (
        SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS r,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS salt
        FROM documents),
      l AS (
        SELECT doc_id,
               lead(doc_id, 1) OVER win AS n1, lead(doc_id, 2) OVER win AS n2,
               lead(doc_id, 3) OVER win AS n3, lead(doc_id, 4) OVER win AS n4
        FROM ring WINDOW win AS (PARTITION BY source, salt ORDER BY r, doc_id))
      SELECT doc_id, neg_rank, neg_id FROM (
        SELECT doc_id, CAST(1 AS BIGINT) AS neg_rank, n1 AS neg_id FROM l
        UNION ALL SELECT doc_id, 2, n2 FROM l
        UNION ALL SELECT doc_id, 3, n3 FROM l
        UNION ALL SELECT doc_id, 4, n4 FROM l)
      WHERE neg_id IS NOT NULL""")),

    // Fixed-length training-row packing — the final pretraining-data step:
    // documents are tokenized, terminated with an <eos> marker, and packed
    // back-to-back into 128-token rows that CROSS document boundaries (no
    // padding waste). Packing is per 50-doc shard, so the concatenation
    // order is a bounded in-group sort (array_sort inside the aggregate),
    // never a global window — at 100 TB each shard packs independently and
    // the row fingerprints pin every token's position in every row.
    Q("tx_pack_tokens", (s, d) => {
      tbl(s, d, "documents")
        .select(col("doc_id"), expr("doc_id div 50").as("sh"),
          // a NULL-text doc still terminates: its stream is just <eos>
          // (DuckDB's list_append(NULL, x) = [x]; Spark's concat would
          // poison the whole shard's flatten with one NULL)
          expr("""concat(coalesce(split(text, ' '),
                         cast(array() as array<string>)),
                  array('<eos>'))""").as("tk"))
        .groupBy("sh")
        .agg(expr(
          "flatten(transform(array_sort(collect_list(struct(doc_id, tk))), s -> s.tk))")
          .as("toks"))
        .select(col("sh"), col("toks"), posexplode(expr(
          """transform(sequence(0, CAST((size(toks) - 1) DIV 128 AS INT)),
             i -> md5(concat_ws(' ', slice(toks, i * 128 + 1, 128))))""")))
        .select(col("sh"), col("pos").cast("long").as("win"),
          least(lit(128), size(col("toks")) - col("pos") * 128).cast("long")
            .as("n_tok"),
          col("col").as("w_md5"))
    }, Some("""
      WITH t AS (
        SELECT doc_id, doc_id // 50 AS sh,
               list_append(string_split(text, ' '), '<eos>') AS tk
        FROM documents),
      f AS (SELECT sh, flatten(list(tk ORDER BY doc_id)) AS toks
            FROM t GROUP BY sh),
      w AS (SELECT sh, toks,
                   unnest(range(0, (len(toks) - 1) // 128 + 1)) AS win
            FROM f)
      SELECT sh, win, least(128, len(toks) - win * 128) AS n_tok,
             md5(array_to_string(
               toks[(win * 128 + 1):(win * 128 + 128)], ' ')) AS w_md5
      FROM w""")),

    // Hybrid retrieval with reciprocal-rank fusion — the RAG serving
    // pattern that combines a lexical ranker and a vector ranker. Lexical:
    // distinct-term overlap between the query stratum and the corpus,
    // candidates generated by a TERM equi-join (posting-list shaped — a
    // production deployment adds tx_postings' df cut to bound the hot
    // terms; the shape is the same). Vector: exact int-quantized dot
    // products against the broadcast query stratum (the ann_topk shape —
    // at 100 TB the brute side swaps for ann_ivf's cluster-pruned join
    // without touching the fusion). Each ranker keeps top-10 per query via
    // a query-partitioned window; fusion is a full outer join on
    // (query, candidate) scoring 1/(60+rank) per list — each document sums
    // at most TWO IEEE doubles, so the fused score is bit-deterministic in
    // both engines, and the final order tie-breaks on candidate id.
    Q("rag_rrf", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val td = Q.spreadSmallScan(tbl(s, d, "documents"))
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("term"))
      val qt = td.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("q_id"), col("term"))
      val wl = Window.partitionBy("q_id")
        .orderBy(col("overlap").desc, col("cand").asc)
      val lex = td.join(broadcast(qt), "term")
        .filter(col("doc_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("doc_id").as("cand"))
        .agg(count(lit(1)).as("overlap"))
        .withColumn("r_lex", row_number().over(wl))
        .filter(col("r_lex") <= 10)
        .select("q_id", "cand", "r_lex")
      val qv = Q.spreadSmallScan(tbl(s, d, "embeddings"))
        .filter(col("embedding").isNotNull) // NULL-vector contract (see qvec)
        .select(col("vec_id"), expr(VectorOps.quant).as("qv"))
      val wv = Window.partitionBy("q_id")
        .orderBy(col("dot").desc, col("cand").asc)
      val vec = qv.as("b")
        .join(broadcast(qv.filter(col("vec_id") % 50 === 0).as("a")),
          expr("a.vec_id != b.vec_id"))
        .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("cand"),
          graft.functions.VectorFunctions
            .long_dot(col("a.qv"), col("b.qv")).as("dot"))
        .withColumn("r_vec", row_number().over(wv))
        .filter(col("r_vec") <= 10)
        .select("q_id", "cand", "r_vec")
      val wf = Window.partitionBy("q_id")
        .orderBy(col("rrf").desc, col("cand").asc)
      lex.join(vec, Seq("q_id", "cand"), "full_outer")
        .select(col("q_id"), col("cand"), col("r_lex"), col("r_vec"),
          (coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("r_vec")), lit(0.0)))
            .as("rrf"))
        .withColumn("fused_rank", row_number().over(wf))
    }, Some(s"""
      WITH ${VectorOps.QVEC_SQL},
      td AS (
        SELECT DISTINCT doc_id, term FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents)),
      lexall AS (
        SELECT q.doc_id AS q_id, c.doc_id AS cand, count(*) AS overlap
        FROM td q JOIN td c ON q.term = c.term AND c.doc_id != q.doc_id
        WHERE q.doc_id % 50 = 0
        GROUP BY 1, 2),
      lex AS (SELECT q_id, cand, r_lex FROM (
        SELECT q_id, cand,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY overlap DESC, cand ASC) AS r_lex
        FROM lexall) WHERE r_lex <= 10),
      dots AS (
        SELECT a.vec_id AS q_id, b.vec_id AS cand,
               CAST(list_dot_product(CAST(a.qv AS DOUBLE[]),
                                     CAST(b.qv AS DOUBLE[])) AS BIGINT) AS dot
        FROM qv a, qv b WHERE a.vec_id % 50 = 0 AND a.vec_id != b.vec_id),
      vec AS (SELECT q_id, cand, r_vec FROM (
        SELECT q_id, cand,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY dot DESC, cand ASC) AS r_vec
        FROM dots) WHERE r_vec <= 10),
      f AS (
        SELECT coalesce(l.q_id, v.q_id) AS q_id,
               coalesce(l.cand, v.cand) AS cand, l.r_lex, v.r_vec,
               coalesce(1.0 / (60 + l.r_lex), 0.0) +
               coalesce(1.0 / (60 + v.r_vec), 0.0) AS rrf
        FROM lex l FULL OUTER JOIN vec v
          ON l.q_id = v.q_id AND l.cand = v.cand)
      SELECT q_id, cand, r_lex, r_vec, rrf,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY rrf DESC, cand ASC) AS fused_rank
      FROM f""")),

    // First-order Markov transition counts — the statistic behind
    // next-action models and session simulators: per ordered (prev, next)
    // event-type pair, its occurrence count and the out-of-prev total
    // (the exact numerator/denominator of the transition probability —
    // no float ratio crosses the gate). One user-partitioned lag (bounded
    // partitions), two hash aggregates; event_id breaks timestamp ties.
    Q("sq_markov", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      // journeys are TIME-ordered: an event with no timestamp has no place
      // in the sequence (same rule across sq_*; oracle filters identically)
      val pairs = tbl(s, d, "events")
        .filter(col("ts").isNotNull)
        .select(col("user_id"), Q.tsMicros(col("ts")).as("us"),
          col("event_id"), col("event_type"))
        .withColumn("prev", lag("event_type", 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type").as("next"))
        .agg(count(lit(1)).as("n"))
      val outTot = pairs.groupBy("prev").agg(sum("n").as("n_from"))
      pairs.join(broadcast(outTot), "prev")
    }, Some("""
      WITH o AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id) AS prev
        FROM events WHERE ts IS NOT NULL),
      p AS (SELECT prev, event_type AS next, count(*) AS n
            FROM o WHERE prev IS NOT NULL GROUP BY 1, 2),
      t AS (SELECT prev, CAST(sum(n) AS BIGINT) AS n_from
            FROM p GROUP BY 1)
      SELECT p.prev, p.next, p.n, t.n_from
      FROM p JOIN t ON p.prev = t.prev""")),

    // Markov removal-effect attribution — the data-driven model that
    // replaced last-touch in marketing science (Anderl et al. 2016): a
    // channel's credit is how much the START→conversion reach DROPS when
    // the channel's node is deleted from the journey graph. Journeys are
    // per-user event sequences with purchase absorbing into 'conv' and a
    // synthetic START before each user's first event; reach is a 4-step
    // value iteration r(s) ← Σ_t n(s→t)·r(t) div n_from(s) carried as
    // EXACT parts-per-billion integers (all operands positive, so
    // DuckDB's floor // and Spark's truncating div agree), run for the
    // full graph and each of the four channel removals. The ONE
    // data-sized pass is the lag + count behind the transition matrix
    // (shared with sq_markov's shape); the matrix itself is
    // states²-bounded — |states| is the event-type vocabulary, fixed by
    // the domain, not the data volume — so the value iteration folds
    // DRIVER-SIDE over the collected matrix (the same
    // bounded-by-construction round-trip as the BPE merge decision),
    // replacing the former 4-step × 5-variant unroll of 20 tiny joins
    // whose scheduling overhead dominated the query at every scale.
    Q("sq_markov_removal", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val o = tbl(s, d, "events")
        .filter(col("ts").isNotNull) // journeys are time-ordered (see sq_markov)
        .select(col("user_id"), Q.tsMicros(col("ts")).as("us"),
          col("event_id"), col("event_type"))
        .withColumn("prev", lag("event_type", 1).over(w))
        .withColumn("rn", row_number().over(w))
      val mapped = when(col("event_type") === "purchase", "conv")
        .otherwise(col("event_type"))
      val trans = o.filter(col("prev").isNotNull && col("prev") =!= "purchase")
        .select(col("prev"), mapped.as("next"))
        .unionByName(o.filter(col("rn") === 1)
          .select(lit("START").as("prev"), mapped.as("next")))
        .groupBy("prev", "next").agg(count(lit(1)).as("n"))
      val nfrom = trans.groupBy("prev").agg(sum("n").as("n_from"))
      // bounded collect: |rows| ≤ |states|² (event-type vocabulary squared)
      val tm = trans.join(nfrom, "prev")
        .select(col("prev"), col("next"), col("n"), col("n_from"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      val states = (tm.map(_._1) ++ tm.map(_._2)).distinct
      // exact ppb value iteration; truncating Long division on
      // non-negative operands == DuckDB's floor // == Spark's div, so the
      // driver fold reproduces the oracle's arithmetic bit-for-bit
      def reach(rows: Array[(String, String, Long, Long)]): Long = {
        var r = states.map(st =>
          st -> (if (st == "conv") 1000000000L else 0L)).toMap
        for (_ <- 1 to 4) {
          val acc = rows.groupBy(_._1).map { case (p, ts) =>
            p -> ts.map(t => t._3 * r(t._2)).sum / ts.head._4
          }
          r = states.map(st => st ->
            (if (st == "conv") 1000000000L else acc.getOrElse(st, 0L))).toMap
        }
        r.getOrElse("START", 0L)
      }
      // an empty slice has no journey graph: the oracle's variant CTEs all
      // join against the empty transition table, so it emits ZERO rows —
      // mirror that instead of fabricating five all-zero variants
      val variants =
        if (tm.isEmpty) Seq.empty
        else ("full", tm) +: Seq("view", "click", "signup", "error")
          .map(c => (s"no_$c", tm.filter(t => t._1 != c && t._2 != c)))
      val fullPpb = reach(tm)
      import s.implicits._
      variants.map { case (name, rows) => (name, reach(rows)) }
        .toDF("variant", "reach_ppb")
        .withColumn("full_ppb", lit(fullPpb))
        // try_divide: a sliced graph with zero START→conv reach yields NULL
        // like DuckDB's x/0, not an ANSI error
        .withColumn("drop_share",
          expr("try_divide(full_ppb - reach_ppb, full_ppb)"))
        .select("variant", "reach_ppb", "full_ppb", "drop_share")
    }, Some(MARKOV_REMOVAL_SQL)),

    // Behavioral sequence construction — the events-to-training-sequences
    // step of a next-action model: per user, the time-ordered event-type
    // sequence (first 32 actions) plus the full count. One hash aggregate;
    // the per-user sort happens INSIDE the aggregated list (array_sort of
    // (ts, event_id, type) structs), so there is no global or windowed
    // sort — at 100 TB this is a single user-keyed shuffle whose rows are
    // user-sized, and the 32-cap bounds every output row regardless of how
    // active a user is. event_id breaks timestamp ties, making the
    // sequence string deterministic in both engines.
    Q("sq_user_seq", (s, d) => {
      tbl(s, d, "events")
        .filter(col("ts").isNotNull) // journeys are time-ordered (see sq_markov)
        .select(col("user_id"), Q.tsMicros(col("ts")).as("us"),
          col("event_id"), col("event_type"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          concat_ws(",", expr(
            """transform(
                 slice(array_sort(collect_list(struct(us, event_id, event_type))), 1, 32),
                 e -> e.event_type)""")).as("seq"))
    }, Some("""
      SELECT user_id, count(*) AS n_events,
             array_to_string(
               (list(event_type ORDER BY epoch_us(ts), event_id))[1:32],
               ',') AS seq
      FROM events WHERE ts IS NOT NULL GROUP BY user_id""")))

  /** One unrolled value-iteration step for variant `v`: r_k(s) =
    * Σ_t n(s→t)·r_{k−1}(t) floor-div n_from(s), conv pinned at 10^9.
    */
  private def mrStepSql(v: String, k: Int): String = {
    val prev = if (k == 1) "r0" else s"r${k - 1}_$v"
    s"""r${k}_$v AS (
        SELECT f.state,
               CASE WHEN f.state = 'conv' THEN CAST(1000000000 AS BIGINT)
                    ELSE CAST(coalesce(s.acc, 0) AS BIGINT) END AS r
        FROM states f LEFT JOIN (
          SELECT t.prev AS state,
                 CAST(sum(t.n * r.r) // max(t.n_from) AS BIGINT) AS acc
          FROM tv_$v t JOIN $prev r ON t.next = r.state
          GROUP BY t.prev) s ON f.state = s.state)"""
  }

  private val MR_CHANNELS = Seq("view", "click", "signup", "error")

  private val MARKOV_REMOVAL_SQL: String = {
    val variants = ("full", "TRUE") +: MR_CHANNELS.map(c =>
      (s"no_$c", s"prev != '$c' AND next != '$c'"))
    val vsql = variants.map { case (v, cond) =>
      (s"tv_$v AS (SELECT * FROM t WHERE $cond)" +:
        (1 to 4).map(k => mrStepSql(v, k))).mkString(",\n      ")
    }.mkString(",\n      ")
    val res = variants.map { case (v, _) =>
      s"SELECT '$v' AS variant, r AS reach_ppb FROM r4_$v WHERE state = 'START'"
    }.mkString("\n        UNION ALL\n        ")
    s"""
      WITH o AS (
        SELECT user_id, event_type,
               lag(event_type) OVER w AS prev,
               row_number() OVER w AS rn
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      tr AS (
        SELECT prev, CASE WHEN event_type = 'purchase' THEN 'conv'
                          ELSE event_type END AS next
        FROM o WHERE prev IS NOT NULL AND prev != 'purchase'
        UNION ALL
        SELECT 'START', CASE WHEN event_type = 'purchase' THEN 'conv'
                             ELSE event_type END
        FROM o WHERE rn = 1),
      tm AS (SELECT prev, next, count(*) AS n FROM tr GROUP BY 1, 2),
      nf AS (SELECT prev, CAST(sum(n) AS BIGINT) AS n_from FROM tm GROUP BY 1),
      t AS (SELECT tm.prev, tm.next, tm.n, nf.n_from
            FROM tm JOIN nf ON tm.prev = nf.prev),
      states AS (SELECT prev AS state FROM t UNION SELECT next FROM t),
      r0 AS (SELECT state,
                    CASE WHEN state = 'conv' THEN CAST(1000000000 AS BIGINT)
                         ELSE CAST(0 AS BIGINT) END AS r
             FROM states),
      $vsql,
      res AS (
        $res),
      fullr AS (SELECT reach_ppb AS full_ppb FROM res WHERE variant = 'full')
      SELECT variant, reach_ppb, full_ppb,
             (full_ppb - reach_ppb) / full_ppb AS drop_share
      FROM res CROSS JOIN fullr"""
  }
}
