package graft.rel

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import Q.tbl

/** BPE tokenizer induction as a Spark job — the vocabulary-training step a
  * training-data pipeline runs over its own corpus before token counting
  * (cf. the reference's per-tile kernel philosophy: a fixed, finite
  * iteration count keeps the plan — and the oracle — closed-form).
  *
  * The classic byte-pair-encoding loop (count adjacent symbol pairs, merge
  * the most frequent, repeat) is driver-iterative by nature: real trainers
  * hold the word-frequency table and pick one merge per round. Here each
  * round is distributed — the word-frequency relation (vocab-sized, NOT
  * corpus-sized: ~millions of rows at 100 TB, after one map-side-combined
  * count over the document scan) is cached once; a round is one explode of
  * adjacent pairs + one (p1,p2) aggregate + a `TakeOrderedAndProject`
  * argmax; only the single winning pair crosses to the driver (the same
  * sanctioned scalar-collect shape as the PQ codebook in
  * [[VectorOps]]). Merges apply as literal string `replace` on a
  * delimiter-armored symbol form — `"abc"` is `"|a||b||c|"`, the pair
  * (x,y) is the literal `"|x||y|"` — so left-to-right non-overlapping
  * replacement implements exactly BPE's scan order ("aaaa" + merge (a,a)
  * → `aa aa`, not `aa a a`), tokens never contain the delimiter, and a
  * cross-token false match is impossible. Three rounds unrolled; all
  * counts are BIGINTs, winners tie-break by (count DESC, p1, p2), so the
  * DuckDB twin is bit-identical.
  */
object TokenizerOps {

  /** Word-frequency relation in armored-symbol form: (word, sym, wc). */
  private def wordFreq(s: SparkSession, d: String): DataFrame =
    Q.spreadSmallScan(tbl(s, d, "documents"))
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("wc"))
      .select(col("word"),
        regexp_replace(col("word"), "(.)", raw"|$$1|").as("sym"), col("wc"))

  /** Adjacent symbol-pair counts of a (sym, wc) relation. */
  private def pairCounts(syms: DataFrame): DataFrame =
    syms
      .withColumn("toks", split(expr("trim(BOTH '|' FROM sym)"), raw"\|\|"))
      .select(col("wc"), explode(expr(
        """CASE WHEN size(toks) >= 2 THEN
             transform(sequence(1, size(toks) - 1),
               i -> struct(element_at(toks, i) AS p1,
                           element_at(toks, i + 1) AS p2))
           ELSE array() END""")).as("pr"))
      .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .agg(sum("wc").as("cnt"))

  /** Run `rounds` BPE merges over the corpus word table; returns the
    * per-round (winner, stats) rows, the final symbol relation, and the
    * relations to cache for the lifetime of the consuming action.
    */
  private def train(s: SparkSession, d: String, rounds: Int)
      : (Seq[DataFrame], DataFrame, Seq[Dataset[_]]) = {
    val words = wordFreq(s, d)
    words.persist()
    val cached = scala.collection.mutable.Buffer[Dataset[_]](words)
    var syms = words
    var rows = Seq.empty[DataFrame]
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      val pairs = pairCounts(syms)
      pairs.persist()
      cached += pairs
      // one row to the driver: the merge decision itself (BPE's driver-side
      // step); everything feeding it stayed distributed
      pairs.orderBy(col("cnt").desc, col("p1"), col("p2"))
        .limit(1).select(col("p1"), col("p2")).collect().headOption match {
        case Some(Row(wp1: String, wp2: String)) =>
          rows :+= pairs.filter(col("p1") === wp1 && col("p2") === wp2)
            .crossJoin(pairs.agg(count(lit(1)).as("n_pairs"),
              sum("cnt").cast("long").as("occ")))
            .select(lit(r).as("round"), col("p1"), col("p2"), col("cnt"),
              col("n_pairs"), col("occ"))
          syms = syms.select(col("word"),
            replace(col("sym"), lit("|" + wp1 + "||" + wp2 + "|"),
              lit("|" + wp1 + wp2 + "|")).as("sym"),
            col("wc"))
        case _ =>
          // no adjacent pairs left (every word a single symbol, or an empty
          // corpus slice): stop with the merges learned so far — standard
          // BPE semantics, and exactly what the SQL oracle's round CTEs do
          // (each remaining round selects from an empty winner relation)
          exhausted = true
      }
    }
    // zero learned merges: the per-round relations never materialized, so
    // hand back the zero-row merge table in their shape
    if (rows.isEmpty)
      rows = Seq(pairCounts(words).limit(0)
        .crossJoin(pairCounts(words).limit(0)
          .agg(count(lit(1)).as("n_pairs"), sum("cnt").cast("long").as("occ")))
        .select(lit(1).as("round"), col("p1"), col("p2"), col("cnt"),
          col("n_pairs"), col("occ"))
        .limit(0))
    (rows, syms, cached.toSeq)
  }

  /** Gate `tx_bpe_train`: the 3 learned merges, each with its pair count
    * and that round's pair-distribution stats.
    */
  def bpeTrain(s: SparkSession, d: String): DataFrame = {
    val (rows, _, cached) = train(s, d, 3)
    graft.Caching.releaseAfterAction(rows.reduce(_ unionByName _), cached: _*)
  }

  /** Gate `tx_bpe_apply`: tokenize the corpus with the learned tokenizer —
    * per document, the BPE token count after the 3 merges vs the character
    * count. The merged word→token-count map is vocab-sized and joins back
    * to the exploded corpus on the word equi-key; at 100 TB that join
    * broadcasts (vocab ≪ corpus) and the per-doc sum is map-side
    * combinable.
    */
  def bpeApply(s: SparkSession, d: String): DataFrame = {
    val (_, syms, cached) = train(s, d, 3)
    val ntoks = syms.select(col("word"),
      size(split(expr("trim(BOTH '|' FROM sym)"), raw"\|\|"))
        .cast("long").as("wt"))
    val out = Q.spreadSmallScan(tbl(s, d, "documents"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(broadcast(ntoks), "word")
      .groupBy("doc_id")
      .agg(sum("wt").as("bpe_tokens"), count(lit(1)).as("words"))
    graft.Caching.releaseAfterAction(out, cached: _*)
  }

  // The DuckDB twin: the same three rounds unrolled as CTEs. Lateral
  // UNNEST(generate_series) enumerates adjacent pairs; `replace` has the
  // same left-to-right non-overlapping scan as Spark's.
  private def symsSql(src: String, win: String): String = s"""
      (SELECT word, replace(sym, '|' || $win.p1 || '||' || $win.p2 || '|',
                                 '|' || $win.p1 || $win.p2 || '|') AS sym, wc
       FROM $src, $win)"""

  private def pairsSql(src: String): String = s"""
      (SELECT x.toks[i] AS p1, x.toks[i + 1] AS p2,
              CAST(sum(wc) AS BIGINT) AS cnt
       FROM (SELECT wc, string_split(trim(sym, '|'), '||') AS toks
             FROM $src) x,
            UNNEST(generate_series(1, len(x.toks) - 1)) AS g(i)
       GROUP BY 1, 2)"""

  private val TRAIN_PREFIX = s"""
      WITH wf AS (
        SELECT w AS word, CAST(count(*) AS BIGINT) AS wc
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE len(w) > 0 GROUP BY w),
      s0 AS (SELECT word, regexp_replace(word, '(.)', '|\\1|', 'g') AS sym, wc
             FROM wf),
      p1c AS ${pairsSql("s0")},
      w1 AS (SELECT p1, p2, cnt FROM p1c ORDER BY cnt DESC, p1, p2 LIMIT 1),
      s1 AS ${symsSql("s0", "w1")},
      p2c AS ${pairsSql("s1")},
      w2 AS (SELECT p1, p2, cnt FROM p2c ORDER BY cnt DESC, p1, p2 LIMIT 1),
      s2 AS ${symsSql("s1", "w2")},
      p3c AS ${pairsSql("s2")},
      w3 AS (SELECT p1, p2, cnt FROM p3c ORDER BY cnt DESC, p1, p2 LIMIT 1),
      s3 AS ${symsSql("s2", "w3")}"""

  private val BPE_TRAIN_SQL = s"""
      $TRAIN_PREFIX
      SELECT 1 AS round, w1.p1, w1.p2, w1.cnt, st.n_pairs, st.occ
      FROM w1, (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                       CAST(sum(cnt) AS BIGINT) AS occ FROM p1c) st
      UNION ALL
      SELECT 2, w2.p1, w2.p2, w2.cnt, st.n_pairs, st.occ
      FROM w2, (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                       CAST(sum(cnt) AS BIGINT) AS occ FROM p2c) st
      UNION ALL
      SELECT 3, w3.p1, w3.p2, w3.cnt, st.n_pairs, st.occ
      FROM w3, (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                       CAST(sum(cnt) AS BIGINT) AS occ FROM p3c) st"""

  private val BPE_APPLY_SQL = s"""
      $TRAIN_PREFIX,
      nt AS (SELECT word,
                    CAST(len(string_split(trim(sym, '|'), '||')) AS BIGINT)
                      AS wt
             FROM s3)
      SELECT doc_id, CAST(sum(nt.wt) AS BIGINT) AS bpe_tokens,
             CAST(count(*) AS BIGINT) AS words
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents) dw
      JOIN nt ON dw.w = nt.word
      WHERE len(dw.w) > 0
      GROUP BY doc_id"""

  /** Streaming twin of tx_bpe_apply — tokenize-at-ingest: documents
    * arrive as a stream and each micro-batch joins the BROADCAST static
    * vocabulary (word -> token count, learned batch-side from the same
    * corpus) — a stream-static join, stateless on the stream side; only
    * the per-doc aggregate keeps state. This is the shape a production
    * ingest uses: the tokenizer is a small static artifact shipped to
    * every executor, the text never re-shuffles for tokenization.
    */
  def bpeApplyStream(s: SparkSession, d: String): DataFrame = {
    val (_, syms, cached) = train(s, d, 3)
    val ntoks = syms.select(col("word"),
      size(split(expr("trim(BOTH '|' FROM sym)"), raw"\|\|"))
        .cast("long").as("wt"))
    val schema = s.read.parquet(s"$d/documents.parquet").schema
    val qn = "st_bpe_sink_" + bpeSinkCounter.incrementAndGet()
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(broadcast(ntoks), "word")
      .groupBy("doc_id")
      .agg(sum("wt").as("bpe_tokens"), count(lit(1)).as("words"))
    val query = graft.streaming.StateSizing.startSized(s)(
      stream.writeStream.outputMode("complete")
        .format("memory").queryName(qn).start())
    try query.processAllAvailable()
    finally {
      query.stop()
      cached.foreach(_.unpersist(blocking = false))
    }
    s.table(qn)
  }

  private val bpeSinkCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  def all: Seq[Q] = Seq(
    Q("tx_bpe_train", bpeTrain, Some(BPE_TRAIN_SQL)),
    Q("tx_bpe_apply", bpeApply, Some(BPE_APPLY_SQL)),
    Q("st_tx_bpe", bpeApplyStream, Some(BPE_APPLY_SQL)))
}
