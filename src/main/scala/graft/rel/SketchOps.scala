package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q.tbl

/** Sketch-accelerated exact operators — the two-pass "sketch prunes, exact
  * verifies" pattern that makes decontamination and heavy-hitter mining
  * affordable at corpus scale while keeping the OUTPUT exactly equal to the
  * naive formulation (so every query here hash-matches a plain-SQL oracle):
  * the sketch can only overestimate / false-positive, never miss, and an
  * exact verification step removes its errors. This is the canonical 100 TB
  * shape: pass 1 builds a fixed-size sketch with no shuffle (partials merge
  * on the driver), pass 2 shuffles only the sketch-surviving sliver.
  */
object SketchOps {

  /** 4-word shingles per doc, distinct within doc (tx_decontam's grammar). */
  private def grams8(df: DataFrame, idCol: String): DataFrame = df
    .withColumn("words", split(col("text"), " "))
    .select(col("doc_id").as(idCol),
      explode(expr(
        """CASE WHEN size(words) >= 4
           THEN transform(sequence(1, size(words) - 3),
                i -> concat_ws(' ', slice(words, i, 4)))
           ELSE array() END""")).as("g"))
    .distinct()

  /** Bloom-prefiltered decontamination. tx_decontam's broadcast join touches
    * every training shingle; here a Bloom filter built over the (small) eval
    * side in one pass is applied map-side to the training stream FIRST, so
    * only the ~fpp sliver of shingles that might be contaminated reaches the
    * join at all — at 100 TB the join input shrinks by ~30x at fpp=0.03
    * while the result stays EXACT: Bloom filters have no false negatives
    * (every truly shared shingle survives the prefilter) and the equi-join
    * eliminates the false positives. Same oracle as tx_decontam.
    */
  def decontamBloom(s: SparkSession, d: String): DataFrame = {
    val docs = Q.spreadSmallScan(tbl(s, d, "documents"))
    val ev = grams8(docs.filter(col("doc_id") % 100 === 0), "eval_id")
    // one action over the SMALL side; at corpus scale you would size
    // expectedNumItems from the eval-set count — here a fixed generous cap.
    // persist FIRST so the bloom build materializes the cache the broadcast
    // join reuses (releaseAfterAction's own persist is then a no-op, and it
    // still releases after the gate action)
    ev.persist()
    // Spark's stat.bloomFilter NPEs on a zero-row input (its aggregate
    // returns NULL bytes); an empty eval slice is legitimate at scale, so
    // build the never-matching filter explicitly — nothing is contaminated
    val bf =
      if (ev.isEmpty)
        org.apache.spark.util.sketch.BloomFilter.create(1 << 20, 0.03)
      else ev.stat.bloomFilter("g", 1 << 20, 0.03)
    // codegen'd probe expression, not a ScalaUDF: the prefilter runs over
    // every training shingle by design, so it must stay in whole-stage
    // codegen (the probe hashes the incoming UTF8String's bytes — exactly
    // what the builder inserted)
    val tr = grams8(docs.filter(col("doc_id") % 100 =!= 0), "doc_id")
      .filter(graft.functions.SketchExpressions.bloom_might_contain(bf, col("g")))
    graft.Caching.releaseAfterAction(
      tr.join(broadcast(ev), "g")
        .groupBy("doc_id", "eval_id")
        .agg(count(lit(1)).as("n_shared")),
      ev)
  }

  private val DECONTAM_SQL = """
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
      GROUP BY t.doc_id, e.eval_id"""

  /** CountMin-pruned exact heavy hitters: frequent words over the corpus.
    * The naive plan shuffles EVERY word instance into a groupBy; here pass 1
    * merges a fixed-size CountMin sketch (shuffle-free — partial sketches
    * combine on the driver), and pass 2 shuffles only instances whose
    * estimate clears the threshold. CMS never underestimates, so every true
    * heavy hitter survives the prefilter; the exact count then drops the
    * overestimated impostors — output identical to the full groupBy.
    * Threshold: 0.5% of total word instances (>= 2), computed identically
    * on both engines with integer division.
    */
  def cmsHeavy(s: SparkSession, d: String): DataFrame = {
    val words = tbl(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
    val total = words.count()
    val thr = math.max(2L, total / 200L)
    // eps 0.0005 -> width 5457 counters x depth 5: ~210 KB, any scale
    val cms = words.stat.countMinSketch("w", 0.0005, 0.99, 42)
    // codegen'd estimate expression (see bloom_might_contain above)
    words.filter(
        graft.functions.SketchExpressions.cms_estimate(cms, col("w")) >= thr)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .filter(col("n") >= thr)
  }

  private val CMS_HEAVY_SQL = """
      WITH wrd AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      t AS (SELECT greatest(2, count(*) // 200) AS thr FROM wrd)
      SELECT w, count(*) AS n FROM wrd GROUP BY w
      HAVING count(*) >= (SELECT thr FROM t)"""

  /** Johnson-Lindenstrauss random projection 64 -> 8 dims with a seed-free
    * arithmetic sign matrix (sign(j, k) from a modular hash of the index
    * pair, so both engines reconstruct the identical matrix from the
    * formula) over the established integer-quantized embedding (exact in
    * both engines). The projection runs INSIDE one whole-stage-codegen
    * higher-order expression — no 64x row explosion, no shuffle before the
    * final 8-rows-per-vector posexplode — which is the map-only shape that
    * survives a 100x scan scale-up. Output long-form (vec_id, k, proj).
    */
  def rpProject(s: SparkSession, d: String): DataFrame =
    Q.spreadSmallScan(tbl(s, d, "embeddings"))
      .select(col("vec_id"), posexplode(expr(
        """transform(sequence(0, 7), k -> aggregate(
             transform(sequence(0, 63), j ->
               CAST(round(CAST(element_at(embedding, j + 1) AS DOUBLE) * 1000)
                    AS BIGINT)
               * CASE WHEN ((j + 1) * 2654435761L + (k + 1) * 40503L) % 97 % 2 = 0
                      THEN 1L ELSE -1L END),
             0L, (acc, x) -> acc + x))""")).as(Seq("k", "proj")))
      .select(col("vec_id"), col("k").cast("long").as("k"), col("proj"))

  private val RP_PROJECT_SQL = """
      WITH el AS (
        SELECT vec_id, j,
               CAST(round(CAST(embedding[j + 1] AS DOUBLE) * 1000) AS BIGINT) AS q
        FROM embeddings, (SELECT unnest(range(0, 64)) AS j)),
      pr AS (
        SELECT vec_id, k,
               sum(q * (CASE WHEN ((j + 1) * 2654435761 + (k + 1) * 40503) % 97 % 2 = 0
                             THEN 1 ELSE -1 END)) AS proj
        FROM el, (SELECT unnest(range(0, 8)) AS k)
        GROUP BY vec_id, k)
      SELECT vec_id, k, CAST(proj AS BIGINT) AS proj FROM pr"""

  def all: Seq[Q] = Seq(
    Q("tx_decontam_bloom", decontamBloom, Some(DECONTAM_SQL)),
    Q("sk_cms_heavy", cmsHeavy, Some(CMS_HEAVY_SQL)),
    Q("vec_rp_project", rpProject, Some(RP_PROJECT_SQL)))
}
