package graft.rel

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{float_dot, long_dot}
import Q.tbl

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Exactness strategy: embeddings are quantized to integers
  * (`round(x * 1000)`), so dot products are exact int64 arithmetic — no
  * float-summation-order divergence between engines. Ranking ties broken by
  * vector id. DuckDB computes the same dots via `list_dot_product` on the
  * quantized vectors (exact in doubles far below 2^53).
  *
  * Scale path: brute-force top-k is the small-side baseline (queries x
  * corpus broadcast); the LSH route (`ann_lsh_bucket`) buckets by
  * deterministic hyperplane signs so candidate generation is an equi-join —
  * the 100 TB-shaped plan.
  */
object VectorOps {

  private[rel] val quant =
    "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"

  /** NULL-vector contract (shared by every vector gate through this base
    * and [[QVEC_SQL]]): a row with a missing embedding carries nothing a
    * vector op can use — it is excluded HERE, once, in both engines, the
    * same way SQL aggregates skip NULL. Without the filter each family
    * fails differently (codegen'd dot NPEs, k-means sentinels, DuckDB's
    * list_inner_product rejects NULL-bearing lists outright).
    */
  // NO spread here (measured, r17): qvec feeds a dozen sub-second
  // latency-bound gates, most of which build it twice (corpus + query
  // side); the spread's fixed cost (an exchange materialized per subtree
  // plus the split-count probe) read +0.2-0.45 s per gate in quiet A/B
  // (ann_topk 0.71 vs 1.09, ann_ivf 0.85 vs 1.20, ann_mmr 0.73 vs 0.89)
  // while the per-gate dot work is too small to repay it. The CPU-dense
  // vector paths that DO repay it keep their own spread (gramCells,
  // annRpBucket, vecCosFloat, rag_rrf, vec_rp_project).
  private def qvec(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "embeddings").filter(col("embedding").isNotNull)
      .select(col("vec_id"), expr(quant).as("qv"))

  /** Exact upper-triangle Gram cells (i, j, n, s_ij) over the quantized
    * corpus, one row per dim pair i ≤ j. Computed as a PER-PARTITION
    * ACCUMULATOR (`mapPartitions` into a d² long array, one emit of 2080
    * cells per partition): the former explode-of-2080-structs-per-row
    * shape inflated the scan ×2080 and probed a hash-agg per cell; the
    * tight two-level loop does the same exact int64 sums at array speed,
    * and the shuffle stays d²·partitions regardless of row count — the
    * 100 TB covariance-pass shape. Fails loudly on a malformed (non-64-d)
    * vector instead of the SQL path's silent null-cell semantics; the
    * corpus contract is fixed-width.
    */
  private def gramCells(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val D = 64
    Q.spreadSmallScan(tbl(s, d, "embeddings").filter(col("embedding").isNotNull))
      .select(expr(quant).as("qv")).as[Seq[Long]]
      .mapPartitions { it =>
        val sums = new Array[Long](D * D)
        var n = 0L
        it.foreach { v =>
          require(v != null && v.length == D,
            s"embedding is not $D-dimensional: ${if (v == null) "null" else v.length}")
          n += 1
          var i = 0
          while (i < D) {
            val vi = v(i)
            var j = i
            while (j < D) { sums(i * D + j) += vi * v(j); j += 1 }
            i += 1
          }
        }
        if (n == 0) Iterator.empty
        else (for { i <- 0 until D; j <- i until D }
          yield ((i + 1).toLong, (j + 1).toLong, n, sums(i * D + j))).iterator
      }
      .toDF("i", "j", "pn", "ps")
      .groupBy("i", "j")
      .agg(sum("pn").as("n"), sum("ps").as("s_ij"))
  }

  private[rel] val QVEC_SQL = """
    qv AS (SELECT vec_id,
                  list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
           FROM embeddings
           WHERE embedding IS NOT NULL)"""

  /** Native fused-loop Catalyst expression (graft.functions.LongDotProduct)
    * — codegen-friendly replacement for aggregate(zip_with(...)).
    */
  private def dotCol = long_dot(col("a.qv"), col("b.qv"))

  /** IVF-style ANN: coarse centroids are a deterministic strided sample of
    * the corpus (vec_id % 100 == 7); every vector is assigned to its
    * max-dot centroid (broadcast — centroid count is tiny); queries search
    * only their own cluster — candidate generation becomes an equi-join on
    * the centroid id, the partition-pruned plan that survives 100 TB.
    * Output: per (query, cluster) the best in-cluster neighbor.
    */
  private def annIvf(s: SparkSession, d: String): DataFrame =
    annIvfCore(qvec(s, d), centEvery = 100L, queryEvery = 50L)

  /** The IVF pipeline over an arbitrary quantized-vector relation
    * `(vec_id, qv)`, with the centroid stride and query stride as
    * parameters. The gate uses corpus-proportional strides (1-in-100
    * centroids, 1-in-50 queries — right for a fixed benchmark table);
    * tools/ShuffleScale drives the SAME code path with a fixed centroid
    * COUNT and a fixed query workload (the 100 TB parametrization: the
    * codebook and the query stream don't grow with the corpus), so the
    * measured exponent is this pipeline's own.
    */
  private[graft] def annIvfCore(qvRel: DataFrame, centEvery: Long,
      queryEvery: Long): DataFrame = {
    // argmax via max(struct(score, -tiebreak, payload)) instead of a
    // row_number window: the window form shuffles and sorts every
    // (vector, centroid) candidate row; the aggregate form map-side-combines
    // each vector's candidates down to one row before the exchange — at
    // cluster scale the shuffle is O(vectors), not O(vectors x centroids)
    // phase 7 mod the stride (the gate's 1-in-100 phase-7 sample exactly;
    // still satisfiable when a probe passes a stride <= 7)
    val cents = qvRel.filter(col("vec_id") % centEvery === (7L % centEvery))
      .select(col("vec_id").as("cid"), col("qv").as("cv"))
    val assign = qvRel.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("qv"), col("cid"),
        long_dot(col("qv"), col("cv")).as("cdot"))
      .groupBy("vec_id")
      .agg(max(struct(col("cdot"), (-col("cid")).as("nc"),
        col("cid"), col("qv"))).as("m"))
      .select(col("vec_id"), col("m.qv").as("qv"), col("m.cid").as("cid"))
    // queries are a strided stratum: broadcast them so the probe side never
    // shuffles; the final top-1 is again an aggregate argmax
    val queries = assign.filter(col("vec_id") % queryEvery === 0)
      .select(col("vec_id").as("id_q"), col("qv").as("query_qv"), col("cid"))
    assign.withColumnRenamed("vec_id", "id_n").join(broadcast(queries), Seq("cid"))
      .filter(col("id_q") =!= col("id_n"))
      .select(col("id_q"), col("id_n"), col("cid"),
        long_dot(col("query_qv"), col("qv")).as("dot"))
      .groupBy("id_q")
      .agg(max(struct(col("dot"), (-col("id_n")).as("nn"),
        col("id_n"), col("cid"))).as("m"))
      .select(col("id_q"), col("m.cid").as("cid"),
        col("m.id_n").as("id_n"), col("m.dot").as("dot"))
  }

  /** Recall@10 of the IVF route against exact brute force, as ONE query —
    * the evaluation loop an ANN deployment runs before trusting its index.
    * Exact top-10 comes from the broadcast-query brute-force pass (the
    * ground truth a 100 TB job computes on a sampled query stratum); IVF
    * top-10 ranks only same-cluster candidates, so its cost stays the
    * partition-pruned equi-join. Output per query: how many of the 10 true
    * neighbors the index surfaced, and how many candidates it ranked —
    * both integers, so the gate is exact. The assignment relation feeds
    * queries, candidates, AND the ground-truth probe; it is cached for the
    * action's lifetime. Windows partition by query id only.
    */
  private def annRecall(s: SparkSession, d: String): DataFrame =
    annRecallProbes(s, d, probes = 1)

  /** Multi-probe generalization: a query searches its `probes` nearest
    * coarse clusters (probe lists are disjoint — every corpus vector lives
    * in exactly one cluster), trading candidate volume for recall; the
    * probe ranking runs only over the tiny query stratum. probes=1 is the
    * classic single-probe IVF.
    */
  private def annRecallProbes(s: SparkSession, d: String, probes: Int)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = qvec(s, d).filter(col("vec_id") % 100 === 7)
      .select(col("vec_id").as("cid"), col("qv").as("cv"))
    val assign = qvec(s, d).crossJoin(broadcast(cents))
      .select(col("vec_id"), col("qv"), col("cid"),
        long_dot(col("qv"), col("cv")).as("cdot"))
      .groupBy("vec_id")
      .agg(max(struct(col("cdot"), (-col("cid")).as("nc"),
        col("cid"), col("qv"))).as("m"))
      .select(col("vec_id"), col("m.qv").as("qv"), col("m.cid").as("cid"))
    val wq = Window.partitionBy("vec_id")
      .orderBy(col("cdot").desc, col("cid").asc)
    val queries = qvec(s, d).filter(col("vec_id") % 50 === 0)
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("qv"), col("cid"),
        long_dot(col("qv"), col("cv")).as("cdot"))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= probes)
      .select(col("vec_id").as("id_q"), col("qv").as("query_qv"), col("cid"))
    val w = Window.partitionBy("id_q").orderBy(col("dot").desc, col("id_n").asc)
    val ivfTop = assign.withColumnRenamed("vec_id", "id_n")
      .join(broadcast(queries), Seq("cid"))
      .filter(col("id_q") =!= col("id_n"))
      .select(col("id_q"), col("id_n"),
        long_dot(col("query_qv"), col("qv")).as("dot"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select(col("id_q"), col("id_n"))
    val exactTop = assign.withColumnRenamed("vec_id", "id_n")
      .crossJoin(broadcast(
        queries.select(col("id_q"), col("query_qv")).distinct()))
      .filter(col("id_q") =!= col("id_n"))
      .select(col("id_q"), col("id_n"),
        long_dot(col("query_qv"), col("qv")).as("dot"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select(col("id_q"), col("id_n"))
    val hits = exactTop.join(ivfTop, Seq("id_q", "id_n"), "left_semi")
      .groupBy("id_q").agg(count(lit(1)).as("h"))
    val nivf = ivfTop.groupBy("id_q").agg(count(lit(1)).as("ni"))
    val out = queries.select(col("id_q")).distinct()
      .join(hits, Seq("id_q"), "left").join(nivf, Seq("id_q"), "left")
      .select(col("id_q"), coalesce(col("h"), lit(0L)).as("hits"),
        coalesce(col("ni"), lit(0L)).as("n_ivf"))
    graft.Caching.releaseAfterAction(out, assign)
  }

  private def annRecallSql(probes: Int) = s"""
      WITH $QVEC_SQL,
      cents AS (SELECT vec_id AS cid, qv AS cv FROM qv WHERE vec_id % 100 = 7),
      cdots AS (
        SELECT b.vec_id, b.qv, a.cid,
               CAST(list_dot_product(CAST(b.qv AS DOUBLE[]), CAST(a.cv AS DOUBLE[])) AS BIGINT) AS cdot
        FROM qv b, cents a),
      assign AS (
        SELECT vec_id, qv, cid FROM (
          SELECT vec_id, qv, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cdot DESC, cid ASC) AS rn
          FROM cdots) WHERE rn = 1),
      queries AS (
        SELECT id_q, query_qv, cid FROM (
          SELECT vec_id AS id_q, qv AS query_qv, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cdot DESC, cid ASC) AS rn
          FROM cdots WHERE vec_id % 50 = 0)
        WHERE rn <= $probes),
      qd AS (SELECT DISTINCT id_q, query_qv FROM queries),
      ivf AS (
        SELECT id_q, id_n FROM (
          SELECT q.id_q, n.vec_id AS id_n,
                 row_number() OVER (PARTITION BY q.id_q ORDER BY
                   CAST(list_dot_product(CAST(q.query_qv AS DOUBLE[]), CAST(n.qv AS DOUBLE[])) AS BIGINT) DESC,
                   n.vec_id ASC) AS rn
          FROM queries q JOIN assign n ON q.cid = n.cid AND q.id_q != n.vec_id)
        WHERE rn <= 10),
      exact AS (
        SELECT id_q, id_n FROM (
          SELECT q.id_q, n.vec_id AS id_n,
                 row_number() OVER (PARTITION BY q.id_q ORDER BY
                   CAST(list_dot_product(CAST(q.query_qv AS DOUBLE[]), CAST(n.qv AS DOUBLE[])) AS BIGINT) DESC,
                   n.vec_id ASC) AS rn
          FROM qd q JOIN assign n ON q.id_q != n.vec_id)
        WHERE rn <= 10),
      hits AS (SELECT e.id_q, CAST(count(*) AS BIGINT) AS h
               FROM exact e JOIN ivf i ON e.id_q = i.id_q AND e.id_n = i.id_n
               GROUP BY e.id_q),
      nivf AS (SELECT id_q, CAST(count(*) AS BIGINT) AS ni
               FROM ivf GROUP BY id_q)
      SELECT q.id_q, coalesce(h.h, 0) AS hits, coalesce(n.ni, 0) AS n_ivf
      FROM (SELECT DISTINCT id_q FROM queries) q
      LEFT JOIN hits h ON q.id_q = h.id_q
      LEFT JOIN nivf n ON q.id_q = n.id_q"""

  private val ANN_IVF_SQL = s"""
      WITH $QVEC_SQL,
      cents AS (SELECT vec_id AS cid, qv AS cv FROM qv WHERE vec_id % 100 = 7),
      cdots AS (
        SELECT b.vec_id, b.qv, a.cid,
               CAST(list_dot_product(CAST(b.qv AS DOUBLE[]), CAST(a.cv AS DOUBLE[])) AS BIGINT) AS cdot
        FROM qv b, cents a),
      assign AS (
        SELECT vec_id, qv, cid FROM (
          SELECT vec_id, qv, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cdot DESC, cid ASC) AS rn
          FROM cdots) WHERE rn = 1),
      hits AS (
        SELECT q.vec_id AS id_q, n.vec_id AS id_n, q.cid AS cid,
               CAST(list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(n.qv AS DOUBLE[])) AS BIGINT) AS dot
        FROM assign q JOIN assign n ON q.cid = n.cid AND q.vec_id != n.vec_id
        WHERE q.vec_id % 50 = 0)
      SELECT id_q, cid, id_n, dot FROM (
        SELECT id_q, cid, id_n, dot,
               row_number() OVER (PARTITION BY id_q
                                  ORDER BY dot DESC, id_n ASC) AS rn
        FROM hits) WHERE rn = 1"""

  /** ann_ivf with the inverted lists PERSISTED — the build-once/query-many
    * index lifecycle: assignments are written hive-partitioned BY CLUSTER
    * ID (each partition directory IS an inverted list), and a probe's
    * "seek the posting list" is Spark's dynamic partition pruning — the
    * broadcast query side's cid set prunes the scan to exactly the probed
    * clusters at runtime, no manual cid collection (plan-guarded in
    * PlanQualitySpec). Same oracle as ann_ivf: the storage lifecycle must
    * be invisible in the numbers. At 100 TB the partitioned assignments
    * table is the index — rewritten only on retrain — and every query
    * batch reads only its probed partitions' bytes.
    */
  private lazy val ivfDiskDir: String = graft.TempDirs.create("graft_ivf_disk")

  private def annIvfDisk(s: SparkSession, d: String): DataFrame = {
    val cents = qvec(s, d).filter(col("vec_id") % 100 === 7)
      .select(col("vec_id").as("cid"), col("qv").as("cv"))
    val assign = qvec(s, d).crossJoin(broadcast(cents))
      .select(col("vec_id"), col("qv"), col("cid"),
        long_dot(col("qv"), col("cv")).as("cdot"))
      .groupBy("vec_id")
      .agg(max(struct(col("cdot"), (-col("cid")).as("nc"),
        col("cid"), col("qv"))).as("m"))
      .select(col("vec_id"), col("m.qv").as("qv"), col("m.cid").as("cid"))
    assign.write.partitionBy("cid").mode(SaveMode.Overwrite)
      .parquet(ivfDiskDir)
    // explicit schema (cid stays LONG instead of directory-name inference,
    // erased by the cast below either way): an empty corpus writes only
    // _SUCCESS, and the read-back must be zero rows, not an inference error
    val index = s.read.schema(assign.schema).parquet(ivfDiskDir)
    val queries = index.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("id_q"), col("qv").as("query_qv"), col("cid"))
    index.withColumnRenamed("vec_id", "id_n")
      .join(broadcast(queries), Seq("cid"))
      .filter(col("id_q") =!= col("id_n"))
      .select(col("id_q"), col("id_n"), col("cid"),
        long_dot(col("query_qv"), col("qv")).as("dot"))
      .groupBy("id_q")
      .agg(max(struct(col("dot"), (-col("id_n")).as("nn"),
        col("id_n"), col("cid"))).as("m"))
      .select(col("id_q"), col("m.cid").cast("long").as("cid"),
        col("m.id_n").as("id_n"), col("m.dot").as("dot"))
  }

  /** Product-quantization ANN: the codebook path that scales ANN past IVF.
    * 8 subspaces x 16 centroids (centroid c of every subspace comes from
    * vector 7c+3 — deterministic, reconstructable in SQL), exact integer
    * arithmetic end-to-end.
    *
    * Encode: per (vector, subspace), the nearest centroid by squared L2 via
    * an aggregate argmin (min of (dist, cid) structs — map-side combinable,
    * no window). Search: asymmetric distance computation — each query's
    * 8x16 lookup table of subspace dots is tiny and broadcast, scoring is an
    * equi-join on (subspace, code) + one sum, and the final top-1 is again
    * an aggregate argmax. No stage is all-pairs; at cluster scale the codes
    * table is 8 bytes/vector instead of 256, which is the point of PQ.
    */
  private def annPq(s: SparkSession, d: String): DataFrame = {
    val subs = qvec(s, d)
      .select(col("vec_id"), explode(expr("sequence(0, 7)")).as("m"), col("qv"))
      .select(col("vec_id"), col("m"),
        expr("slice(qv, m * 8 + 1, 8)").as("sv"))
    val cents = subs.filter(col("vec_id") % 7 === 3 && col("vec_id") <= 108)
      .select(expr("vec_id div 7").as("cid"), col("m"), col("sv").as("cv"))
    val codes = subs.join(broadcast(cents), Seq("m"))
      .select(col("vec_id"), col("m"), col("cid"),
        (long_dot(col("sv"), col("sv"))
          - lit(2) * long_dot(col("sv"), col("cv"))
          + long_dot(col("cv"), col("cv"))).as("dist"))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("dist"), col("cid"))).as("mn"))
      .select(col("vec_id"), col("m"), col("mn.cid").as("code"))
    val lut = subs.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("id_q"), col("m"), col("sv").as("qsv"))
      .join(broadcast(cents), Seq("m"))
      .select(col("id_q"), col("m"), col("cid").as("code"),
        long_dot(col("qsv"), col("cv")).as("pdot"))
    codes.join(broadcast(lut), Seq("m", "code"))
      .filter(col("id_q") =!= col("vec_id"))
      .groupBy(col("id_q"), col("vec_id").as("id_n"))
      .agg(sum("pdot").as("adc"))
      .groupBy("id_q")
      .agg(max(struct(col("adc"), (-col("id_n")).as("ni"), col("id_n"))).as("t"))
      .select(col("id_q"), col("t.id_n").as("id_n"), col("t.adc").as("adc"))
  }

  /** CTEs yielding `codes(vec_id, m, code)` — the relational PQ encode both
    * PQ queries' oracles share.
    */
  private val PQ_CODES_CTES = s"""$QVEC_SQL,
      subs AS (
        SELECT vec_id, m.m AS m, qv[m.m * 8 + 1 : m.m * 8 + 8] AS sv
        FROM qv, range(0, 8) m(m)),
      cents AS (
        SELECT vec_id // 7 AS cid, m, sv AS cv FROM subs
        WHERE vec_id % 7 = 3 AND vec_id <= 108),
      dists AS (
        SELECT s.vec_id, s.m, c.cid,
               CAST(list_dot_product(CAST(s.sv AS DOUBLE[]), CAST(s.sv AS DOUBLE[]))
                  - 2 * list_dot_product(CAST(s.sv AS DOUBLE[]), CAST(c.cv AS DOUBLE[]))
                  + list_dot_product(CAST(c.cv AS DOUBLE[]), CAST(c.cv AS DOUBLE[]))
                 AS BIGINT) AS dist
        FROM subs s JOIN cents c ON s.m = c.m),
      codes AS (
        SELECT vec_id, m, cid AS code FROM (
          SELECT vec_id, m, cid,
                 row_number() OVER (PARTITION BY vec_id, m
                                    ORDER BY dist ASC, cid ASC) AS rn
          FROM dists) WHERE rn = 1)"""

  private val ANN_PQ_SQL = s"""
      WITH $PQ_CODES_CTES,
      lut AS (
        SELECT s.vec_id AS id_q, s.m, c.cid AS code,
               CAST(list_dot_product(CAST(s.sv AS DOUBLE[]), CAST(c.cv AS DOUBLE[]))
                 AS BIGINT) AS pdot
        FROM subs s JOIN cents c ON s.m = c.m
        WHERE s.vec_id % 50 = 0),
      scores AS (
        SELECT l.id_q, c.vec_id AS id_n, CAST(sum(l.pdot) AS BIGINT) AS adc
        FROM codes c JOIN lut l ON l.m = c.m AND l.code = c.code
        WHERE l.id_q != c.vec_id
        GROUP BY l.id_q, c.vec_id)
      SELECT id_q, id_n, adc FROM (
        SELECT id_q, id_n, adc,
               row_number() OVER (PARTITION BY id_q
                                  ORDER BY adc DESC, id_n ASC) AS rn
        FROM scores) WHERE rn = 1"""

  /** The PQ encode as ONE native codegen expression
    * ([[graft.functions.PqEncodeWord]]): the 16-vector codebook is small BY
    * CONSTRUCTION, so collecting it to the driver and embedding it as an
    * array literal ships the same information a broadcast would — and the
    * encoder becomes a fused three-level loop inside whole-stage codegen
    * emitting one packed long per vector, instead of exploding 128
    * candidate rows per vector through a shuffle-backed argmin. The oracle
    * recomputes the codes relationally and packs them the same way.
    */
  private def annPqNative(s: SparkSession, d: String): DataFrame = {
    import graft.functions.VectorFunctions.pq_encode_word
    val cents = qvec(s, d)
      .filter(col("vec_id") % 7 === 3 && col("vec_id") <= 108)
      .select(col("vec_id"), col("qv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    if (cents.isEmpty)
      // an empty codebook encodes nothing: the oracle's argmin over zero
      // centroids yields zero code rows — match it instead of encoding
      // against a phantom all-zero codebook
      qvec(s, d).select(col("vec_id"), lit(0L).as("pqword")).limit(0)
    else {
      // slot layout mirrors the oracle's cid = vec_id // 7 — a centroid
      // vector dropped by the NULL-vector contract leaves a HOLE, filled
      // with a far sentinel (1e7 per component: its squared distance is
      // ~6e15, six orders beyond any real quantized distance and still
      // overflow-safe in the encoder's int64 arithmetic), so holes never
      // win the argmin and codes range over exactly the present slots
      val bySlot = cents.map { case (vid, v) => (vid / 7).toInt -> v }.toMap
      val FAR = 10000000L
      val flat = new Array[Long](8 * 16 * 8)
      for (cid <- 0 until 16; m <- 0 until 8; j <- 0 until 8)
        flat((m * 16 + cid) * 8 + j) =
          bySlot.get(cid).map(_(m * 8 + j)).getOrElse(FAR)
      qvec(s, d).select(col("vec_id"),
        pq_encode_word(col("qv"), lit(flat)).as("pqword"))
    }
  }

  private val ANN_PQ_NATIVE_SQL = s"""
      WITH $PQ_CODES_CTES
      SELECT vec_id,
             CAST(sum(code * CAST(2 ** (4 * m) AS BIGINT)) AS BIGINT) AS pqword
      FROM codes GROUP BY vec_id"""

  /** IVF+PQ composed — the production ANN shape: a coarse quantizer prunes
    * candidates to the query's cluster (equi-join on the coarse id), and
    * PQ-on-RESIDUALS scores them asymmetrically:
    * `score(q, n) ≈ dot(q, coarse(n)) + Σ_m lut_q[m][code_m(n)]`
    * where codes quantize `n - coarse(n)`. Residuals stay exact integers
    * (elementwise subtraction of quantized vectors), so both engines agree
    * bit-for-bit. Every stage is an aggregate argmin/argmax or a broadcast
    * equi-join; candidate volume is cluster-local, never corpus-wide.
    */
  /** Shared IVF+PQ machinery: returns the ADC-scored candidate pairs
    * `(id_q, id_n, adc)` (cluster-local, asymmetric-distance-scored) plus
    * the cached coarse-assignment relation for dependency release / exact
    * vector lookup. [[annIvfPq]] takes the ADC top-1; [[annIvfPqRerank]]
    * shortlists top-3 and re-ranks them with exact dots.
    */
  private def ivfPqScored(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val base = qvec(s, d)
    val coarse = base.filter(col("vec_id") % 100 === 7)
      .select(col("vec_id").as("ccid"), col("qv").as("ccv"))
    // assign feeds codes, the residual codebook, queries, and the base
    // term: cache it once (released after the consuming action) so the
    // coarse-assignment pass runs once, not four times
    val assign = base.crossJoin(broadcast(coarse))
      .select(col("vec_id"), col("qv"), col("ccid"), col("ccv"),
        long_dot(col("qv"), col("ccv")).as("cdot"))
      .groupBy("vec_id")
      .agg(max(struct(col("cdot"), (-col("ccid")).as("nc"),
        col("ccid"), col("qv"), col("ccv"))).as("t"))
      .select(col("vec_id"), col("t.ccid").as("ccid"), col("t.qv").as("qv"),
        expr("zip_with(t.qv, t.ccv, (a, b) -> a - b)").as("rv"))
    val subs = assign
      .select(col("vec_id"), col("ccid"),
        explode(expr("sequence(0, 7)")).as("m"), col("rv"))
      .select(col("vec_id"), col("ccid"), col("m"),
        expr("slice(rv, m * 8 + 1, 8)").as("sv"))
    val cents = subs.filter(col("vec_id") % 7 === 3 && col("vec_id") <= 108)
      .select(expr("vec_id div 7").as("cid"), col("m"), col("sv").as("cv"))
    val codes = subs.join(broadcast(cents), Seq("m"))
      .select(col("vec_id"), col("ccid"), col("m"), col("cid"),
        (long_dot(col("sv"), col("sv"))
          - lit(2) * long_dot(col("sv"), col("cv"))
          + long_dot(col("cv"), col("cv"))).as("dist"))
      .groupBy("vec_id", "ccid", "m")
      .agg(min(struct(col("dist"), col("cid"))).as("mn"))
      .select(col("vec_id"), col("ccid"), col("m"), col("mn.cid").as("code"))
    val queries = assign.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("id_q"), col("ccid").as("qccid"),
        col("qv").as("qqv"))
    val lut = queries
      .select(col("id_q"), col("qccid"),
        explode(expr("sequence(0, 7)")).as("m"), col("qqv"))
      .select(col("id_q"), col("qccid"), col("m"),
        expr("slice(qqv, m * 8 + 1, 8)").as("qsv"))
      .join(broadcast(cents), Seq("m"))
      .select(col("id_q"), col("qccid"), col("m"), col("cid").as("code"),
        long_dot(col("qsv"), col("cv")).as("pdot"))
    val baseTerm = queries.join(broadcast(coarse),
        col("qccid") === col("ccid"))
      .select(col("id_q"), col("qccid"),
        long_dot(col("qqv"), col("ccv")).as("bdot"))
    val scored = codes.as("c").join(broadcast(lut.as("l")),
        expr("l.m = c.m AND l.code = c.code AND l.qccid = c.ccid"))
      .filter(col("l.id_q") =!= col("c.vec_id"))
      .groupBy(col("l.id_q").as("id_q"), col("c.vec_id").as("id_n"),
        col("c.ccid").as("ccid"))
      .agg(sum("l.pdot").as("rdot"))
      .join(broadcast(baseTerm.withColumnRenamed("qccid", "ccid")),
        Seq("id_q", "ccid"))
      .select(col("id_q"), col("id_n"), (col("bdot") + col("rdot")).as("adc"))
    (scored, assign)
  }

  private def annIvfPq(s: SparkSession, d: String): DataFrame = {
    val (scored, assign) = ivfPqScored(s, d)
    scored
      .groupBy("id_q")
      .agg(max(struct(col("adc"), (-col("id_n")).as("ni"), col("id_n"))).as("t"))
      .select(col("id_q"), col("t.id_n").as("id_n"), col("t.adc").as("adc"))
      .transform(graft.Caching.releaseAfterAction(_, assign))
  }

  /** IVF+PQ with exact re-rank — the full production serving shape: the ADC
    * score shortlists top-3 per query (a window over the cluster-local,
    * already-aggregated candidate set), then ONLY those 3 rows join back to
    * the true vectors (from the cached assignment — no corpus re-scan) for
    * an exact integer dot, which picks the final neighbor. Compression
    * error from the codebook affects only the shortlist cut, never the
    * reported score.
    */
  private def annIvfPqRerank(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (scored, assign) = ivfPqScored(s, d)
    val w = Window.partitionBy("id_q").orderBy(col("adc").desc, col("id_n").asc)
    val short = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    val vecs = assign.select(col("vec_id"), col("qv"))
    short
      .join(vecs.select(col("vec_id").as("id_n"), col("qv").as("nv")), "id_n")
      .join(broadcast(
        vecs.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("id_q"), col("qv").as("qvv"))), "id_q")
      .select(col("id_q"), col("id_n"), col("adc"),
        long_dot(col("qvv"), col("nv")).as("dot"))
      .groupBy("id_q")
      .agg(max(struct(col("dot"), (-col("id_n")).as("ni"), col("id_n"),
        col("adc"))).as("t"))
      .select(col("id_q"), col("t.id_n").as("id_n"), col("t.dot").as("dot"),
        col("t.adc").as("adc"))
      .transform(graft.Caching.releaseAfterAction(_, assign))
  }

  /** Embedding-cosine near-dup corpus: every 20th vector re-appears scaled
    * by a small deterministic factor (direction-preserving, so cosine vs the
    * original is ~1 up to quantization). Detection: cos >= 0.95 via the
    * exact integer inequality 400*dot^2 >= 361*|a|^2*|b|^2 with dot >= 0.
    */
  private def nearCorpus(s: SparkSession, d: String): DataFrame = {
    // NULL-vector contract (see qvec): missing embeddings join no cluster
    // (no spread — same measured rationale as qvec: dd_semantic 1.57 vs
    // 1.74, dd_embed_cos 1.46 vs 1.61 in the quiet A/B)
    val base = tbl(s, d, "embeddings").filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
    base.unionByName(
      base.filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 100000).as("vec_id"),
          expr("transform(embedding, x -> x * CAST(1.0 + (vec_id % 7 - 3) * 0.001 AS FLOAT))")
            .as("embedding")))
      .select(col("vec_id"), expr(quant).as("qv"))
  }

  private val NEAR_CORPUS_SQL = """
    corpus AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE embedding IS NOT NULL
      UNION ALL
      SELECT v2 AS vec_id,
             list_transform(embedding,
               x -> x * CAST(1.0 + (vec_id % 7 - 3) * 0.001 AS FLOAT)) AS embedding
      FROM (SELECT vec_id, vec_id + 100000 AS v2, embedding
            FROM embeddings
            WHERE embedding IS NOT NULL AND vec_id % 20 = 0)),
    qv AS (SELECT vec_id,
                  list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
           FROM corpus)"""

  /** 4-hyperplane sign-pattern bucket over quantized vectors: hyperplane h
    * has components ((i*31 + h*17) % 7) - 3 over dimension index i; the
    * bucket is the 4-bit sign pattern of the projections. Direction-preserving
    * jitter cannot flip a sign, so near-identical vectors land in the same
    * bucket and candidate generation becomes an equi-join on `bucket` — the
    * O(n) shape shared by every embedding near-dup query below.
    */
  private def lshBuckets(s: SparkSession, c: DataFrame): DataFrame = {
    val planes = s.range(4).select(col("id").cast("int").as("h"))
    c.crossJoin(broadcast(planes))
      .select(col("vec_id"), col("qv"), col("h"),
        expr("""aggregate(zip_with(qv, sequence(0, 63),
                  (x, i) -> x * (((i * 31 + h * 17) % 7) - 3)),
                0L, (acc, v) -> acc + v)""").as("proj"))
      .groupBy("vec_id")
      .agg(first(col("qv")).as("qv"),
        sum(expr("IF(proj > 0, CAST(pow(2, h) AS BIGINT), 0L)")).as("bucket"))
  }

  /** Multi-probe variant of [[lshBuckets]]: a vector emits its canonical
    * 4-bit sign code AND every code reachable by flipping planes whose
    * projection is within `margin` of zero (one row per emitted code).
    *
    * Soundness: buckets hash the QUANTIZED vectors, and quantization happens
    * after the jitter, so a projection can change sign between a vector and
    * its jittered twin by up to the quantization noise. That noise is
    * bounded: per component |round(1000*x*(1+eps)) - round(1000*x)| <=
    * 1000*|x|*0.003 + 1 < 3 (|x| < 0.6 in this corpus, |eps| <= 0.003),
    * hyperplane components are in [-3, 3], 64 dims => |proj(twin) -
    * proj(orig)| <= 64*3*3 = 576. With margin >= that bound, each twin
    * emits the other's canonical code (bit=1 needs proj > -margin, bit=0
    * needs proj <= margin), so every jitter-twin pair provably shares a
    * bucket. Recall of arbitrary (non-twin) cos>=0.95 pairs remains
    * empirically gated by the hash check, as with any LSH scheme.
    */
  private def lshBucketsProbe(s: SparkSession, c: DataFrame,
      margin: Int): DataFrame = {
    val planes = s.range(4).select(col("id").cast("int").as("h"))
    val bit = (h: Int) => s"(CAST(c / ${1 << h} AS INT) % 2) = 1"
    val planeOk = (h: Int) =>
      s"(IF(${bit(h)}, p$h > ${-margin}, p$h <= $margin))"
    c.crossJoin(broadcast(planes))
      .select(col("vec_id"), col("qv"), col("h"),
        expr("""aggregate(zip_with(qv, sequence(0, 63),
                  (x, i) -> x * (((i * 31 + h * 17) % 7) - 3)),
                0L, (acc, v) -> acc + v)""").as("proj"))
      .groupBy("vec_id")
      .agg(first(col("qv")).as("qv"),
        sum(when(col("h") === 0, col("proj"))).as("p0"),
        sum(when(col("h") === 1, col("proj"))).as("p1"),
        sum(when(col("h") === 2, col("proj"))).as("p2"),
        sum(when(col("h") === 3, col("proj"))).as("p3"))
      .select(col("vec_id"), col("qv"),
        explode(expr(s"""filter(sequence(0, 15), c ->
          ${(0 to 3).map(planeOk).mkString(" AND ")})""")).as("bucket"))
  }

  /** The full scale-shaped embedding near-dup chain: hyperplane LSH buckets
    * generate candidates via an equi-join (no cross product), then the exact
    * integer cosine test verifies — the vector mirror of the
    * minhash -> jaccard chain. Runs over the jittered near-dup corpus.
    */
  private def embedLshVerify(s: SparkSession, d: String): DataFrame = {
    val buckets = lshBuckets(s, nearCorpus(s, d))
    val a = buckets.as("a"); val b = buckets.as("b")
    a.join(b, expr("a.bucket = b.bucket AND a.vec_id < b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        long_dot(col("a.qv"), col("b.qv")).as("dot"),
        long_dot(col("a.qv"), col("a.qv")).as("na"),
        long_dot(col("b.qv"), col("b.qv")).as("nb"))
      .filter(expr("dot >= 0 AND 400 * dot * dot >= 361 * na * nb"))
      .select("id_a", "id_b", "dot")
  }

  private val EMBED_LSH_VERIFY_SQL = s"""
      WITH $NEAR_CORPUS_SQL,
      proj AS (
        SELECT vec_id, qv, h,
               CAST(list_dot_product(CAST(qv AS DOUBLE[]),
                 CAST(list_transform(range(0, 64),
                   i -> ((i * 31 + h * 17) % 7) - 3) AS DOUBLE[])) AS BIGINT) AS proj
        FROM qv, (VALUES (0),(1),(2),(3)) hs(h)),
      buckets AS (
        SELECT vec_id, any_value(qv) AS qv,
               sum(CASE WHEN proj > 0 THEN CAST(pow(2, h) AS BIGINT) ELSE 0 END) AS bucket
        FROM proj GROUP BY vec_id),
      pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(list_dot_product(CAST(a.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])) AS BIGINT) AS dot,
               CAST(list_dot_product(CAST(a.qv AS DOUBLE[]), CAST(a.qv AS DOUBLE[])) AS BIGINT) AS na,
               CAST(list_dot_product(CAST(b.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])) AS BIGINT) AS nb
        FROM buckets a JOIN buckets b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
      SELECT id_a, id_b, dot FROM pairs
      WHERE dot >= 0 AND 400 * dot * dot >= 361 * na * nb"""

  /** Raw-float cosine via the native [[graft.functions.FloatDotProduct]]
    * expression (no quantization): each float widens to double and
    * accumulates in order — the exact op sequence of DuckDB's
    * `list_dot_product` over `CAST(... AS DOUBLE[])`, verified bit-equal.
    * Two small strata cross-joined (broadcast) keep the pair set bounded.
    */
  private def vecCosFloat(s: SparkSession, d: String): DataFrame = {
    val e = Q.spreadSmallScan(tbl(s, d, "embeddings"))
    val a = e.filter(col("vec_id") % 97 === 3)
      .select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = e.filter(col("vec_id") % 89 === 7)
      .select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    a.crossJoin(broadcast(b)).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        float_dot(col("ea"), col("eb")).as("dot"),
        (float_dot(col("ea"), col("eb")) /
          sqrt(float_dot(col("ea"), col("ea")) *
            float_dot(col("eb"), col("eb")))).as("cos"))
  }

  /** Two-iteration Lloyd k-means over the embedding corpus — the semantic
    * clustering step of a curation pipeline (domain discovery / data
    * mixing). Exactness construction: iteration 1 assigns by integer
    * squared-L2 to a strided centroid sample; the recomputed centroids are
    * per-dimension means ROUNDED TO THE 1/1000 GRID the corpus quantization
    * already uses (round(1000 * sum / n) — one exact double division and a
    * half-away-from-zero round, identical in both engines), so iteration
    * 2's distances are again pure int64 and no floating-point fold ever
    * happens. At scale: assignment is a broadcast cross of k centroids +
    * aggregate argmin (map-side combinable, no window over the corpus);
    * mean recomputation is one hash aggregate on (cluster, dim).
    */
  /** The one-Lloyd-round distance relation (vec_id × updated centroid →
    * exact squared L2), shared by km_cluster (argmin census) and
    * km_assign_quality (inertia + separation margins). Returns (d2, a1)
    * where a1 is the cached first-assignment dep.
    */
  private def kmD2(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val base = qvec(s, d)
    val c0 = base.filter(col("vec_id") % 100 === 7)
      .select(col("vec_id").as("cid"), col("qv").as("cv"))
    val a1 = base.crossJoin(broadcast(c0))
      .select(col("vec_id"), col("qv"), col("cid"),
        (long_dot(col("qv"), col("qv"))
          - lit(2) * long_dot(col("qv"), col("cv"))
          + long_dot(col("cv"), col("cv"))).as("dist"))
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cid"), col("qv"))).as("m"))
      .select(col("vec_id"), col("m.qv").as("qv"), col("m.cid").as("c1"))
    val means = a1
      .select(col("c1"), posexplode(col("qv")).as(Seq("dim", "v")))
      .groupBy("c1", "dim")
      .agg(expr("CAST(round(CAST(sum(v) AS DOUBLE) * 1000 / count(1)) AS BIGINT)")
        .as("mv"))
      .groupBy("c1")
      .agg(expr("transform(array_sort(collect_list(struct(dim, mv))), x -> x.mv)")
        .as("cv"))
      .select(col("c1").as("cid2"), col("cv"))
    val d2 = a1.crossJoin(broadcast(means))
      .select(col("vec_id"), col("cid2"),
        expr("zip_with(qv, cv, (x, y) -> x * 1000 - y)").as("diff"))
      .select(col("vec_id"), col("cid2"),
        long_dot(col("diff"), col("diff")).as("dist"))
    (d2, a1)
  }

  private def kmCluster(s: SparkSession, d: String): DataFrame = {
    val (d2, a1) = kmD2(s, d)
    val a2 = d2
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cid2"))).as("m"))
      .select(col("vec_id"), col("m.cid2").as("cluster"))
    graft.Caching.releaseAfterAction(
      a2.groupBy("cluster")
        .agg(count(lit(1)).as("n"), sum("vec_id").as("sum_id"),
          min("vec_id").as("min_id"), max("vec_id").as("max_id")),
      a1)
  }

  /** Assignment-quality audit over the same Lloyd round — the numbers a
    * clustering job publishes to decide k and spot degenerate cells:
    * per-cluster inertia (Σ own-centroid squared distance — EXACT int64
    * on the quantized corpus) and the separation margin to the runner-up
    * centroid (min and sum — a small margin means the cell boundary cuts
    * through dense mass). No floats anywhere; the two-smallest selection
    * is an in-aggregate sort over the per-vector centroid candidates,
    * so nothing beyond the d2 relation ever shuffles.
    */
  private def kmQuality(s: SparkSession, d: String): DataFrame = {
    val (d2, a1) = kmD2(s, d)
    val two = d2
      .groupBy("vec_id")
      .agg(expr("slice(array_sort(collect_list(struct(dist, cid2))), 1, 2)")
        .as("s"))
      .select(col("vec_id"),
        col("s").getItem(0).getField("cid2").as("cluster"),
        col("s").getItem(0).getField("dist").as("da"),
        col("s").getItem(1).getField("dist").as("db"))
    graft.Caching.releaseAfterAction(
      two.groupBy("cluster")
        .agg(count(lit(1)).as("n"), sum("da").as("sse"),
          min(col("db") - col("da")).as("margin_min"),
          sum(col("db") - col("da")).as("margin_sum")),
      a1)
  }

  private val KM_CTES = s"""
      WITH $QVEC_SQL,
      c0 AS (SELECT vec_id AS cid, qv AS cv FROM qv WHERE vec_id % 100 = 7),
      d1 AS (
        SELECT b.vec_id, b.qv, a.cid,
               CAST(list_dot_product(CAST(b.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[]))
                  - 2 * list_dot_product(CAST(b.qv AS DOUBLE[]), CAST(a.cv AS DOUBLE[]))
                  + list_dot_product(CAST(a.cv AS DOUBLE[]), CAST(a.cv AS DOUBLE[]))
                 AS BIGINT) AS dist
        FROM qv b, c0 a),
      a1 AS (
        SELECT vec_id, qv, cid AS c1 FROM (
          SELECT vec_id, qv, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY dist ASC, cid ASC) AS rn
          FROM d1) WHERE rn = 1),
      dims AS (
        SELECT c1, i.i AS dim, qv[i.i] AS v FROM a1, range(1, 65) i(i)),
      means AS (
        SELECT c1, dim,
               CAST(round(CAST(sum(v) AS DOUBLE) * 1000 / count(*)) AS BIGINT) AS mv
        FROM dims GROUP BY c1, dim),
      cv2 AS (SELECT c1 AS cid2, list(mv ORDER BY dim) AS cv FROM means GROUP BY c1),
      d2 AS (
        SELECT v.vec_id, c.cid2,
               CAST(list_dot_product(
                 CAST(list_transform(range(1, 65), i -> v.qv[i] * 1000 - c.cv[i]) AS DOUBLE[]),
                 CAST(list_transform(range(1, 65), i -> v.qv[i] * 1000 - c.cv[i]) AS DOUBLE[]))
                 AS BIGINT) AS dist
        FROM a1 v, cv2 c)"""

  private val KM_CLUSTER_SQL = KM_CTES + s""",
      a2 AS (
        SELECT vec_id, cid2 AS cluster FROM (
          SELECT vec_id, cid2,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY dist ASC, cid2 ASC) AS rn
          FROM d2) WHERE rn = 1)
      SELECT cluster, count(*) AS n, CAST(sum(vec_id) AS BIGINT) AS sum_id,
             min(vec_id) AS min_id, max(vec_id) AS max_id
      FROM a2 GROUP BY cluster"""

  private val KM_QUALITY_SQL = KM_CTES + s""",
      r1 AS (
        SELECT vec_id, cid2, dist,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist ASC, cid2 ASC) AS rn
        FROM d2),
      two AS (
        SELECT a.vec_id, a.cid2 AS cluster, a.dist AS da, b.dist AS db
        FROM r1 a JOIN r1 b ON a.vec_id = b.vec_id
        WHERE a.rn = 1 AND b.rn = 2)
      SELECT cluster, count(*) AS n, CAST(sum(da) AS BIGINT) AS sse,
             min(db - da) AS margin_min,
             CAST(sum(db - da) AS BIGINT) AS margin_sum
      FROM two GROUP BY cluster"""

  /** SemDeDup-shaped semantic dedup (cluster, then prune inside clusters):
    * every vector is k-means-assigned (one exact integer squared-L2 pass
    * against the broadcast strided-sample centroids, cf. [[kmCluster]]),
    * and the cosine near-duplicate test runs only on INTRA-CLUSTER pairs —
    * the clustering is what bounds pair generation, so the self-join is an
    * equi-join on the cluster id, never an all-pairs cross. A vector is a
    * duplicate when some lower-id cluster-mate has cosine >= 0.95 with it
    * (integer form: dot >= 0 and 400*dot^2 >= 361*|a|^2*|b|^2 — exact in
    * int64 for the 1/1000-quantized corpus); the kept representative of
    * each similarity ball is its lowest id. Output: each removed vector
    * with its cluster, its lowest-id witness, and how many kept-or-removed
    * mates matched. Corpus is [[nearCorpus]] (planted jittered twins).
    *
    * At 100 TB: assignment is broadcast-cross + map-side-combined argmin
    * (one O(corpus) shuffle), the pair join shuffles on cluster id with
    * per-cluster fan-in bounded by k sizing, and the final argmin is again
    * an aggregate, not a window over the corpus.
    */
  private def ddSemantic(s: SparkSession, d: String): DataFrame = {
    val corpus = nearCorpus(s, d)
    val cents = corpus
      .filter(col("vec_id") % 100 === 7 && col("vec_id") < 100000)
      .select(col("vec_id").as("cid"), col("qv").as("cv"))
    val assign = corpus.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("qv"), col("cid"),
        (long_dot(col("qv"), col("qv"))
          - lit(2) * long_dot(col("qv"), col("cv"))
          + long_dot(col("cv"), col("cv"))).as("dist"))
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cid"), col("qv"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cluster"), col("m.qv").as("qv"))
    val a = assign.as("a"); val b = assign.as("b")
    a.join(b, col("a.cluster") === col("b.cluster") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("b.vec_id").as("vec_id"), col("a.cluster").as("cluster"),
        col("a.vec_id").as("id_a"),
        long_dot(col("a.qv"), col("b.qv")).as("dot"),
        long_dot(col("a.qv"), col("a.qv")).as("na"),
        long_dot(col("b.qv"), col("b.qv")).as("nb"))
      .filter(expr("dot >= 0 AND 400 * dot * dot >= 361 * na * nb"))
      .groupBy("vec_id", "cluster")
      .agg(min("id_a").as("witness"), count(lit(1)).as("n_dups"))
  }

  private val DD_SEMANTIC_SQL = s"""
      WITH $NEAR_CORPUS_SQL,
      cents AS (SELECT vec_id AS cid, qv AS cv FROM qv
                WHERE vec_id % 100 = 7 AND vec_id < 100000),
      d1 AS (
        SELECT b.vec_id, b.qv, a.cid,
               CAST(list_dot_product(CAST(b.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[]))
                  - 2 * list_dot_product(CAST(b.qv AS DOUBLE[]), CAST(a.cv AS DOUBLE[]))
                  + list_dot_product(CAST(a.cv AS DOUBLE[]), CAST(a.cv AS DOUBLE[]))
                 AS BIGINT) AS dist
        FROM qv b, cents a),
      asg AS (
        SELECT vec_id, qv, cid AS cluster FROM (
          SELECT vec_id, qv, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY dist ASC, cid ASC) AS rn
          FROM d1) WHERE rn = 1),
      pairs AS (
        SELECT b.vec_id AS vec_id, a.cluster, a.vec_id AS id_a,
               CAST(list_dot_product(CAST(a.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])) AS BIGINT) AS dot,
               CAST(list_dot_product(CAST(a.qv AS DOUBLE[]), CAST(a.qv AS DOUBLE[])) AS BIGINT) AS na,
               CAST(list_dot_product(CAST(b.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])) AS BIGINT) AS nb
        FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
      SELECT vec_id, cluster, min(id_a) AS witness, count(*) AS n_dups
      FROM pairs
      WHERE dot >= 0 AND 400 * dot * dot >= 361 * na * nb
      GROUP BY vec_id, cluster"""

  /** Oracle CTE chain shared by ann_ivfpq and ann_ivfpq_rerank: coarse
    * assignment, residual codebook, PQ codes, per-query LUT, base term, and
    * the summed residual-dot scores.
    */
  private val IVFPQ_CTES = s"""
      WITH $QVEC_SQL,
      coarse AS (SELECT vec_id AS ccid, qv AS ccv FROM qv WHERE vec_id % 100 = 7),
      cdots AS (
        SELECT b.vec_id, b.qv, a.ccid, a.ccv,
               CAST(list_dot_product(CAST(b.qv AS DOUBLE[]), CAST(a.ccv AS DOUBLE[])) AS BIGINT) AS cdot
        FROM qv b, coarse a),
      assign AS (
        SELECT vec_id, qv, ccid,
               list_transform(range(1, 65), i -> qv[i] - ccv[i]) AS rv
        FROM (
          SELECT vec_id, qv, ccid, ccv,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cdot DESC, ccid ASC) AS rn
          FROM cdots) WHERE rn = 1),
      subs AS (
        SELECT vec_id, ccid, m.m AS m, rv[m.m * 8 + 1 : m.m * 8 + 8] AS sv
        FROM assign, range(0, 8) m(m)),
      cents AS (
        SELECT vec_id // 7 AS cid, m, sv AS cv FROM subs
        WHERE vec_id % 7 = 3 AND vec_id <= 108),
      dists AS (
        SELECT s.vec_id, s.ccid, s.m, c.cid,
               CAST(list_dot_product(CAST(s.sv AS DOUBLE[]), CAST(s.sv AS DOUBLE[]))
                  - 2 * list_dot_product(CAST(s.sv AS DOUBLE[]), CAST(c.cv AS DOUBLE[]))
                  + list_dot_product(CAST(c.cv AS DOUBLE[]), CAST(c.cv AS DOUBLE[]))
                 AS BIGINT) AS dist
        FROM subs s JOIN cents c ON s.m = c.m),
      codes AS (
        SELECT vec_id, ccid, m, cid AS code FROM (
          SELECT vec_id, ccid, m, cid,
                 row_number() OVER (PARTITION BY vec_id, m
                                    ORDER BY dist ASC, cid ASC) AS rn
          FROM dists) WHERE rn = 1),
      queries AS (
        SELECT vec_id AS id_q, ccid AS qccid, qv AS qqv
        FROM assign WHERE vec_id % 50 = 0),
      lut AS (
        SELECT q.id_q, q.qccid, c.m, c.cid AS code,
               CAST(list_dot_product(
                 CAST(q.qqv[c.m * 8 + 1 : c.m * 8 + 8] AS DOUBLE[]),
                 CAST(c.cv AS DOUBLE[])) AS BIGINT) AS pdot
        FROM queries q, cents c),
      base_term AS (
        SELECT q.id_q, q.qccid AS ccid,
               CAST(list_dot_product(CAST(q.qqv AS DOUBLE[]), CAST(a.ccv AS DOUBLE[])) AS BIGINT) AS bdot
        FROM queries q JOIN coarse a ON q.qccid = a.ccid),
      scores AS (
        SELECT l.id_q, c.vec_id AS id_n, c.ccid,
               CAST(sum(l.pdot) AS BIGINT) AS rdot
        FROM codes c JOIN lut l
          ON l.m = c.m AND l.code = c.code AND l.qccid = c.ccid
        WHERE l.id_q != c.vec_id
        GROUP BY l.id_q, c.vec_id, c.ccid)"""

  /** Int8 post-training quantization of the embedding column — the
    * compression step every embedding-serving stack runs before ANN. Scale
    * is per-vector symmetric (q = round(127·v/maxabs)), expressed as pure
    * integer arithmetic with `div` on non-negative operands only (floor vs
    * truncate never diverges between engines), plus the exact integer
    * reconstruction error Σ(127·v − q·maxabs)². Scale shape: a single
    * projection — array lambdas per row, NO shuffle, no join; the 100 TB
    * plan is one scan.
    */
  private def vecInt8Quant(s: SparkSession, d: String): DataFrame = {
    qvec(s, d)
      .withColumn("maxabs",
        greatest(array_max(expr("transform(qv, x -> abs(x))")), lit(1L)))
      .withColumn("q8", expr(
        """transform(qv, v -> CASE
             WHEN v >= 0 THEN (254 * v + maxabs) div (2 * maxabs)
             ELSE -((254 * (-v) + maxabs) div (2 * maxabs)) END)"""))
      .select(col("vec_id"), col("maxabs"),
        expr("aggregate(q8, CAST(0 AS BIGINT), (a, x) -> a + x)").as("qsum"),
        expr("aggregate(q8, CAST(0 AS BIGINT), (a, x) -> a + x * x)")
          .as("qnorm2"),
        expr("""aggregate(
                  zip_with(qv, q8,
                    (v, q) -> (127 * v - q * maxabs) * (127 * v - q * maxabs)),
                  CAST(0 AS BIGINT), (a, x) -> a + x)""").as("err2"))
  }

  private val VEC_INT8_SQL = s"""
    WITH $QVEC_SQL,
    m AS (
      SELECT vec_id, qv,
             greatest(list_max(list_transform(qv, x -> abs(x))), 1) AS maxabs
      FROM qv),
    q8t AS (
      SELECT vec_id, qv, maxabs,
             list_transform(qv, v -> CASE
               WHEN v >= 0 THEN (254 * v + maxabs) // (2 * maxabs)
               ELSE -((254 * (-v) + maxabs) // (2 * maxabs)) END) AS q8
      FROM m)
    SELECT vec_id, CAST(maxabs AS BIGINT) AS maxabs,
           CAST(list_sum(q8) AS BIGINT) AS qsum,
           CAST(list_sum(list_transform(q8, x -> x * x)) AS BIGINT) AS qnorm2,
           CAST(list_sum(list_transform(range(1, len(qv) + 1),
             i -> (127 * qv[i] - q8[i] * maxabs)
                  * (127 * qv[i] - q8[i] * maxabs))) AS BIGINT) AS err2
    FROM q8t"""

  /** RP-bucket ANN: vec_rp_project's deterministic 64->8 JL sign
    * projection as a SECOND hash family in the ladder — the 8-bit code of
    * projection signs buckets the corpus, candidate generation is an
    * equi-join on the code against the (broadcast) query stratum, and the
    * exact quantized dot picks the best in-bucket neighbor per query
    * (aggregate-argmax, no window). Queries whose bucket holds no partner
    * yield no row — identically on both engines.
    */
  private val RP_CODE =
    """aggregate(sequence(0, 7), 0L, (acc, k) -> acc + IF(
         aggregate(sequence(0, 63), 0L, (a2, j) ->
           a2 + CAST(round(CAST(element_at(embedding, j + 1) AS DOUBLE) * 1000)
                AS BIGINT)
             * CASE WHEN ((j + 1) * 2654435761L + (k + 1) * 40503L) % 97 % 2 = 0
                    THEN 1L ELSE -1L END) > 0,
         CAST(pow(2, k) AS BIGINT), 0L))"""

  private def annRpBucket(s: SparkSession, d: String): DataFrame = {
    val coded = Q.spreadSmallScan(tbl(s, d, "embeddings")
        .filter(col("embedding").isNotNull)) // NULL-vector contract (see qvec)
      .select(col("vec_id"), expr(RP_CODE).as("code"), expr(quant).as("qv"))
    val qs = coded.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("code"), col("qv").as("q_qv"))
    val cand = coded.join(broadcast(qs), Seq("code"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("id_n"),
        long_dot(col("q_qv"), col("qv")).as("dot"))
    cand.groupBy("q_id")
      .agg(max(struct(col("dot"), (-col("id_n")).as("neg"),
        col("id_n"))).as("b"))
      .select(col("q_id"), col("b.id_n").as("id_n"), col("b.dot").as("dot"))
  }

  private val ANN_RP_BUCKET_SQL = s"""
      WITH $QVEC_SQL,
      pj AS (
        SELECT e.vec_id, k.k AS k,
               CAST(sum(CAST(round(CAST(e.embedding[j.j + 1] AS DOUBLE) * 1000)
                        AS BIGINT)
                    * (CASE WHEN ((j.j + 1) * 2654435761 + (k.k + 1) * 40503)
                                 % 97 % 2 = 0
                            THEN 1 ELSE -1 END)) AS BIGINT) AS proj
        FROM embeddings e, (SELECT unnest(range(0, 64)) AS j) j,
             (SELECT unnest(range(0, 8)) AS k) k
        WHERE e.embedding IS NOT NULL
        GROUP BY e.vec_id, k.k),
      code AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN proj > 0 THEN CAST(pow(2, k) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS code
        FROM pj GROUP BY vec_id),
      q AS (
        SELECT c.vec_id AS q_id, c.code, v.qv AS q_qv
        FROM code c JOIN qv v ON v.vec_id = c.vec_id
        WHERE c.vec_id % 50 = 0),
      cand AS (
        SELECT q.q_id, a.vec_id AS id_n,
               CAST(list_dot_product(CAST(q.q_qv AS DOUBLE[]),
                 CAST(av.qv AS DOUBLE[])) AS BIGINT) AS dot
        FROM q JOIN code a ON a.code = q.code AND a.vec_id != q.q_id
               JOIN qv av ON av.vec_id = a.vec_id)
      SELECT q_id, id_n, dot FROM (
        SELECT q_id, id_n, dot,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY dot DESC, id_n ASC) AS rn
        FROM cand) WHERE rn = 1"""

  /** MMR (maximal marginal relevance) diversification — the retrieval
    * post-processor that trades relevance against redundancy: from each
    * query's top-10 exact-dot candidates, greedily pick 5 maximizing
    * `7*rel - 3*max_sim_to_selected` (lambda=0.7 scaled to integers, so
    * every score is exact int64; ties break to the lowest candidate id).
    * The greedy recurrence is unrolled to 5 relational rounds — each an
    * anti-join (drop selected) + equi-join to the selected set's pairwise
    * sims + one argmax — over the PERSISTED candidate and sim relations,
    * both bounded at 10 and 90 rows per query regardless of corpus size:
    * the per-query work is constant, so the operator scales with query
    * count only.
    */
  private val MMR_K = 5

  def mmr(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val qv = qvec(s, d)
    val w = Window.partitionBy("q_id").orderBy(col("rel").desc, col("cand").asc)
    val cand = qv.as("b")
      .join(broadcast(qv.filter(col("vec_id") % 50 === 0).as("a")),
        expr("a.vec_id != b.vec_id"))
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("cand"),
        dotCol.as("rel"), col("b.qv").as("cqv"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select("q_id", "cand", "rel", "cqv")
    // the greedy itself is per-query local over the k-bounded candidate
    // set (10 rows, 45 sims) — ONE q_id-keyed aggregate then a typed
    // flatMap, never more shuffles; the earlier 4-round relational
    // unrolling re-paid a join+window+aggregate per step for work that
    // fits in registers (15.9 s -> corpus-scan-bound)
    cand.groupBy("q_id")
      .agg(collect_list(struct(col("cand"), col("rel"), col("cqv")))
        .as("cs"))
      .as[(Long, Seq[(Long, Long, Seq[Long])])]
      .flatMap { case (q, csRaw) =>
        val cs = csRaw.sortBy(t => (-t._2, t._1))
        val vecs = cs.map(t => t._1 -> t._3.toArray).toMap
        val rel = cs.map(t => t._1 -> t._2).toMap
        def dot(a: Array[Long], b: Array[Long]): Long = {
          var s = 0L; var i = 0
          while (i < a.length) { s += a(i) * b(i); i += 1 }
          s
        }
        var selected = Vector(cs.head._1)
        while (selected.length < MMR_K && selected.length < cs.length) {
          val next = cs.map(_._1).filterNot(selected.contains).map { c =>
            val pen = selected.map(sl => dot(vecs(c), vecs(sl))).max
            (7L * rel(c) - 3L * pen, -c)
          }.max
          selected :+= -next._2
        }
        selected.zipWithIndex.map { case (c, i) => (q, i + 1, c) }
      }
      .toDF("q_id", "step", "cand")
  }

  private def mmrSql: String = {
    val rounds = (2 to MMR_K).map { r =>
      s"""
      rem$r AS (
        SELECT c.q_id, c.cand, c.rel FROM cand c
        LEFT JOIN selu${r - 1} u ON c.q_id = u.q_id AND c.cand = u.cand
        WHERE u.cand IS NULL),
      pen$r AS (
        SELECT m.q_id, m.cand, m.rel, max(cs.sim) AS pen
        FROM rem$r m
        JOIN csim cs ON cs.q_id = m.q_id AND cs.a = m.cand
        JOIN selu${r - 1} u ON u.q_id = cs.q_id AND u.cand = cs.b
        GROUP BY 1, 2, 3),
      s$r AS (
        SELECT q_id, cand FROM (
          SELECT q_id, cand,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY 7 * rel - 3 * pen DESC, cand ASC) AS rn
          FROM pen$r) WHERE rn = 1),
      selu$r AS (SELECT * FROM selu${r - 1}
                 UNION ALL SELECT q_id, $r, cand FROM s$r)"""
    }.mkString(",")
    s"""
      WITH $QVEC_SQL,
      dots AS (
        SELECT a.vec_id AS q_id, b.vec_id AS cand,
               CAST(list_dot_product(CAST(a.qv AS DOUBLE[]),
                                     CAST(b.qv AS DOUBLE[])) AS BIGINT)
                 AS rel
        FROM qv a, qv b WHERE a.vec_id % 50 = 0 AND a.vec_id != b.vec_id),
      cand AS (
        SELECT q_id, cand, rel FROM (
          SELECT q_id, cand, rel,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY rel DESC, cand ASC) AS rn
          FROM dots) WHERE rn <= 10),
      csim AS (
        SELECT x.q_id, x.cand AS a, y.cand AS b,
               CAST(list_dot_product(CAST(xq.qv AS DOUBLE[]),
                                     CAST(yq.qv AS DOUBLE[])) AS BIGINT)
                 AS sim
        FROM cand x JOIN cand y ON x.q_id = y.q_id AND x.cand != y.cand
        JOIN qv xq ON xq.vec_id = x.cand
        JOIN qv yq ON yq.vec_id = y.cand),
      s1 AS (
        SELECT q_id, cand FROM (
          SELECT q_id, cand,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY rel DESC, cand ASC) AS rn
          FROM cand) WHERE rn = 1),
      selu1 AS (SELECT q_id, 1 AS step, cand FROM s1),
      $rounds
      SELECT q_id, step, cand FROM selu$MMR_K"""
  }

  /** Binary (1-bit) quantization retrieval — the modern memory-floor ANN
    * path (64 dims -> ONE long word of sign bits, 32x smaller than int8):
    * Hamming distance via bit_count(xor) prunes to 10 candidates per
    * query, exact int dots rerank to the final 3. Sign words build with
    * disjoint-bit sums (== OR, carry-free, so DuckDB's arithmetic replay
    * is bit-identical including bit 63's two's-complement wrap). At scale
    * the Hamming pass streams the corpus past broadcast query words —
    * 8 bytes per vector — and only the 10 survivors touch full vectors.
    */
  private val SIGN_SQL_SPARK =
    """aggregate(sequence(0, 63), CAST(0 AS BIGINT),
       (acc, i) -> acc + IF(element_at(embedding, i + 1) > 0F,
                            shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))"""

  // DuckDB's checked shift refuses 1 << 63; bit 63 enters as the min-long
  // literal instead (disjoint-bit sums never carry, and sum(BIGINT) runs
  // in HUGEINT, so the cast back is the exact two's-complement word)
  private val SIGN_SQL_DUCK =
    """(SELECT CAST(sum(CASE WHEN embedding[i + 1] <= 0 THEN 0
                        WHEN i = 63
                          THEN CAST(-9223372036854775808 AS HUGEINT)
                        ELSE CAST(CAST(1 AS BIGINT) << i AS HUGEINT)
                        END) AS BIGINT)
        FROM range(0, 64) AS t(i))"""

  def binaryAnn(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vecs = tbl(s, d, "embeddings")
      .filter(col("embedding").isNotNull) // NULL-vector contract (see qvec)
      .select(col("vec_id"), expr(SIGN_SQL_SPARK).as("w"),
        expr(quant).as("qv"))
    val wq = Window.partitionBy("q_id")
      .orderBy(col("ham").asc, col("cand").asc)
    val wr = Window.partitionBy("q_id")
      .orderBy(col("dot").desc, col("cand").asc)
    vecs.as("b")
      .join(broadcast(vecs.filter(col("vec_id") % 50 === 0).as("a")),
        expr("a.vec_id != b.vec_id"))
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("cand"),
        expr("CAST(bit_count(a.w ^ b.w) AS BIGINT)").as("ham"),
        dotCol.as("dot"))
      .withColumn("hr", row_number().over(wq)).filter(col("hr") <= 10)
      .withColumn("rr", row_number().over(wr)).filter(col("rr") <= 3)
      .select(col("q_id"), col("cand"), col("ham"), col("dot"),
        col("rr").as("rank"))
  }

  /** Recall@10 of the Hamming prune against exact top-10 — the quality
    * measurement that makes ann_binary an ENGINEERED trade rather than a
    * hope: per query, how many of the true top-10 survive in the binary
    * candidate set (the gate carries the exact integer hit counts; the
    * corpus recall is their sum over 10*|Q|).
    */
  def binaryRecall(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vecs = tbl(s, d, "embeddings")
      .filter(col("embedding").isNotNull) // NULL-vector contract (see qvec)
      .select(col("vec_id"), expr(SIGN_SQL_SPARK).as("w"),
        expr(quant).as("qv"))
    val joined = vecs.as("b")
      .join(broadcast(vecs.filter(col("vec_id") % 50 === 0).as("a")),
        expr("a.vec_id != b.vec_id"))
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("cand"),
        expr("CAST(bit_count(a.w ^ b.w) AS BIGINT)").as("ham"),
        dotCol.as("dot"))
    val we = Window.partitionBy("q_id").orderBy(col("dot").desc, col("cand").asc)
    val wh = Window.partitionBy("q_id").orderBy(col("ham").asc, col("cand").asc)
    val exact = joined.withColumn("rn", row_number().over(we))
      .filter(col("rn") <= 10).select("q_id", "cand")
    val ham = joined.withColumn("rn", row_number().over(wh))
      .filter(col("rn") <= 10).select("q_id", "cand")
    exact.join(ham, Seq("q_id", "cand"))
      .groupBy("q_id").agg(count(lit(1)).as("n_hits"))
      .withColumn("k", lit(10L))
  }

  def all: Seq[Q] = Seq(
    Q("ann_binary_recall", binaryRecall, Some(s"""
      WITH $QVEC_SQL,
      sw AS (SELECT vec_id, $SIGN_SQL_DUCK AS w FROM embeddings
             WHERE embedding IS NOT NULL),
      v AS (SELECT q.vec_id, q.qv, s.w
            FROM qv q JOIN sw s ON q.vec_id = s.vec_id),
      pairs AS (
        SELECT a.vec_id AS q_id, b.vec_id AS cand,
               CAST(bit_count(CAST(xor(a.w, b.w) AS BIGINT)) AS BIGINT)
                 AS ham,
               CAST(list_dot_product(CAST(a.qv AS DOUBLE[]),
                                     CAST(b.qv AS DOUBLE[])) AS BIGINT)
                 AS dot
        FROM v a, v b WHERE a.vec_id % 50 = 0 AND a.vec_id != b.vec_id),
      exact AS (
        SELECT q_id, cand FROM (
          SELECT q_id, cand, row_number() OVER (PARTITION BY q_id
            ORDER BY dot DESC, cand ASC) AS rn FROM pairs) WHERE rn <= 10),
      ham10 AS (
        SELECT q_id, cand FROM (
          SELECT q_id, cand, row_number() OVER (PARTITION BY q_id
            ORDER BY ham ASC, cand ASC) AS rn FROM pairs) WHERE rn <= 10)
      SELECT e.q_id, count(*) AS n_hits, CAST(10 AS BIGINT) AS k
      FROM exact e JOIN ham10 h ON e.q_id = h.q_id AND e.cand = h.cand
      GROUP BY e.q_id""")),
    Q("ann_binary", binaryAnn, Some(s"""
      WITH $QVEC_SQL,
      sw AS (
        SELECT vec_id, $SIGN_SQL_DUCK AS w
        FROM embeddings WHERE embedding IS NOT NULL),
      v AS (SELECT q.vec_id, q.qv, s.w
            FROM qv q JOIN sw s ON q.vec_id = s.vec_id),
      ham AS (
        SELECT a.vec_id AS q_id, b.vec_id AS cand,
               CAST(bit_count(CAST(xor(a.w, b.w) AS BIGINT)) AS BIGINT)
                 AS ham,
               CAST(list_dot_product(CAST(a.qv AS DOUBLE[]),
                                     CAST(b.qv AS DOUBLE[])) AS BIGINT)
                 AS dot
        FROM v a, v b WHERE a.vec_id % 50 = 0 AND a.vec_id != b.vec_id),
      c10 AS (
        SELECT q_id, cand, ham, dot FROM (
          SELECT q_id, cand, ham, dot,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY ham ASC, cand ASC) AS hr
          FROM ham) WHERE hr <= 10)
      SELECT q_id, cand, ham, dot, rank FROM (
        SELECT q_id, cand, ham, dot,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY dot DESC, cand ASC) AS rank
        FROM c10) WHERE rank <= 3""")),
    Q("ann_mmr", mmr, Some(mmrSql)),
    Q("ann_rp_bucket", annRpBucket, Some(ANN_RP_BUCKET_SQL)),

    Q("vec_int8_quant", vecInt8Quant, Some(VEC_INT8_SQL)),

    Q("vec_cos_float", vecCosFloat, Some("""
      WITH a AS (SELECT vec_id AS id_a, embedding AS ea
                 FROM embeddings WHERE vec_id % 97 = 3),
      b AS (SELECT vec_id AS id_b, embedding AS eb
            FROM embeddings WHERE vec_id % 89 = 7)
      SELECT id_a, id_b,
             list_dot_product(CAST(ea AS DOUBLE[]), CAST(eb AS DOUBLE[])) AS dot,
             list_dot_product(CAST(ea AS DOUBLE[]), CAST(eb AS DOUBLE[])) /
             sqrt(list_dot_product(CAST(ea AS DOUBLE[]), CAST(ea AS DOUBLE[])) *
                  list_dot_product(CAST(eb AS DOUBLE[]), CAST(eb AS DOUBLE[]))) AS cos
      FROM a, b WHERE id_a < id_b""")),

    Q("ann_ivf", annIvf, Some(ANN_IVF_SQL)),
    Q("ann_ivf_disk", annIvfDisk, Some(ANN_IVF_SQL)),

    Q("ann_recall", annRecall, Some(annRecallSql(1))),

    Q("ann_recall_probe2", (s, d) => annRecallProbes(s, d, probes = 2),
      Some(annRecallSql(2))),

    Q("ann_pq", annPq, Some(ANN_PQ_SQL)),

    Q("ann_pq_native", annPqNative, Some(ANN_PQ_NATIVE_SQL)),

    Q("ann_ivfpq", annIvfPq, Some(s"""
      $IVFPQ_CTES
      SELECT id_q, id_n, adc FROM (
        SELECT s.id_q, s.id_n, b.bdot + s.rdot AS adc,
               row_number() OVER (PARTITION BY s.id_q
                                  ORDER BY b.bdot + s.rdot DESC, s.id_n ASC) AS rn
        FROM scores s JOIN base_term b
          ON s.id_q = b.id_q AND s.ccid = b.ccid) WHERE rn = 1""")),

    Q("ann_ivfpq_rerank", annIvfPqRerank, Some(s"""
      $IVFPQ_CTES,
      shortlist AS (
        SELECT id_q, id_n, adc FROM (
          SELECT s.id_q, s.id_n, b.bdot + s.rdot AS adc,
                 row_number() OVER (PARTITION BY s.id_q
                                    ORDER BY b.bdot + s.rdot DESC, s.id_n ASC) AS rn
          FROM scores s JOIN base_term b
            ON s.id_q = b.id_q AND s.ccid = b.ccid) WHERE rn <= 3),
      rer AS (
        SELECT sl.id_q, sl.id_n, sl.adc,
               CAST(list_dot_product(CAST(q.qv AS DOUBLE[]),
                 CAST(n.qv AS DOUBLE[])) AS BIGINT) AS dot
        FROM shortlist sl JOIN qv q ON q.vec_id = sl.id_q
                          JOIN qv n ON n.vec_id = sl.id_n)
      SELECT id_q, id_n, dot, adc FROM (
        SELECT id_q, id_n, dot, adc,
               row_number() OVER (PARTITION BY id_q
                                  ORDER BY dot DESC, id_n ASC) AS rn
        FROM rer) WHERE rn = 1""")),
    Q("km_cluster", kmCluster, Some(KM_CLUSTER_SQL)),

    Q("km_assign_quality", kmQuality, Some(KM_QUALITY_SQL)),

    Q("dd_semantic", ddSemantic, Some(DD_SEMANTIC_SQL)),

    Q("dd_embed_lsh_verify", embedLshVerify, Some(EMBED_LSH_VERIFY_SQL)),

    // -- embedding-cosine near-duplicate detection ---------------------------
    // Candidates come from the multi-probe LSH bucket equi-join
    // (lshBucketsProbe): a pair reaches the exact integer-cosine verify only
    // if the two vectors share an emitted 4-bit code. The ORACLE stays the
    // all-pairs definition; margin 576 covers the worst-case quantization
    // noise between a vector and its jittered twin (see lshBucketsProbe), so
    // every twin pair the oracle counts provably survives candidate
    // generation, while the PLAN stays the O(n) equi-join (multi-probe
    // fan-out is ~1.3x rows) that survives a 100x corpus.
    Q("dd_embed_cos", (s, d) => {
      val probes = lshBucketsProbe(s, nearCorpus(s, d), margin = 576)
      val a = probes.as("a"); val b = probes.as("b")
      a.join(b, col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id") && col("b.vec_id") >= 100000)
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          col("a.qv").as("qa"), col("b.qv").as("qb"))
        // a pair sharing several probe codes joins once per shared code:
        // dedupe on the ids (qa/qb are functions of the ids) before the dots
        .dropDuplicates("id_a", "id_b")
        .select(col("id_a"), col("id_b"),
          long_dot(col("qa"), col("qb")).as("dot"),
          long_dot(col("qa"), col("qa")).as("na"),
          long_dot(col("qb"), col("qb")).as("nb"))
        .filter(expr("dot >= 0 AND 400 * dot * dot >= 361 * na * nb"))
        .select("id_a", "id_b", "dot", "na", "nb")
    }, Some(s"""
      WITH $NEAR_CORPUS_SQL,
      norms AS (
        SELECT vec_id,
               CAST(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS BIGINT) AS nn
        FROM qv),
      pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(list_dot_product(CAST(a.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])) AS BIGINT) AS dot
        FROM qv a, qv b
        WHERE a.vec_id < b.vec_id AND b.vec_id >= 100000)
      SELECT p.id_a, p.id_b, p.dot, na.nn AS na, nb.nn AS nb
      FROM pairs p JOIN norms na ON p.id_a = na.vec_id
                   JOIN norms nb ON p.id_b = nb.vec_id
      WHERE p.dot >= 0 AND 400 * p.dot * p.dot >= 361 * na.nn * nb.nn""")),

    // -- exact pairwise dots between two deterministic strata ----------------
    Q("vec_dot_pairs", (s, d) => {
      val a = qvec(s, d).filter(col("vec_id") % 25 === 0).as("a")
      // broadcast the (bounded) b stratum: nested-loop over a broadcast
      // instead of a two-sided shuffled CartesianProduct
      val b = qvec(s, d).filter(col("vec_id") % 25 === 13).as("b")
      a.crossJoin(broadcast(b))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          dotCol.as("dot"))
    }, Some(s"""
      WITH $QVEC_SQL
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(list_dot_product(CAST(a.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])) AS BIGINT) AS dot
      FROM qv a, qv b
      WHERE a.vec_id % 25 = 0 AND b.vec_id % 25 = 13""")),

    // -- brute-force MIPS top-5 per query vector -----------------------------
    Q("ann_topk", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      // broadcast the (small) query stratum and stream the corpus past it —
      // the join direction that survives a 100x corpus scale-up
      val q = qvec(s, d).filter(col("vec_id") % 50 === 0).as("a")
      val c = qvec(s, d).as("b")
      val w = Window.partitionBy("id_q").orderBy(col("dot").desc, col("id_n").asc)
      c.join(broadcast(q), expr("a.vec_id != b.vec_id"))
        .select(col("a.vec_id").as("id_q"), col("b.vec_id").as("id_n"),
          dotCol.as("dot"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
    }, Some(s"""
      WITH $QVEC_SQL,
      dots AS (
        SELECT a.vec_id AS id_q, b.vec_id AS id_n,
               CAST(list_dot_product(CAST(a.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])) AS BIGINT) AS dot
        FROM qv a, qv b
        WHERE a.vec_id % 50 = 0 AND a.vec_id != b.vec_id)
      SELECT id_q, id_n, dot, rn FROM (
        SELECT id_q, id_n, dot,
               row_number() OVER (PARTITION BY id_q
                                  ORDER BY dot DESC, id_n ASC) AS rn
        FROM dots) WHERE rn <= 5""")),

    // -- filtered vector search (predicate + top-k in one plan) --------------
    // The shape every RAG stack needs and most ANN indexes bolt on badly:
    // top-3 by exact quantized dot RESTRICTED to corpus vectors whose
    // document metadata passes a predicate (non-English here). The filter
    // is applied PRE-search as an equi-join on the id — so recall over the
    // filtered stratum is exact by construction, unlike post-filtering a
    // fixed-k unfiltered result (which silently under-returns when the
    // predicate is selective). The metadata join is key-partitioned; the
    // bounded query stratum broadcasts; ranking windows per query.
    Q("ann_filtered", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val meta = tbl(s, d, "documents")
        .filter(col("lang") =!= "en")
        .select(col("doc_id").as("vec_id"))
      val q = qvec(s, d).filter(col("vec_id") % 50 === 0).as("a")
      val c = qvec(s, d).join(meta, "vec_id").as("b")
      val w = Window.partitionBy("id_q").orderBy(col("dot").desc, col("id_n").asc)
      c.join(broadcast(q), expr("a.vec_id != b.vec_id"))
        .select(col("a.vec_id").as("id_q"), col("b.vec_id").as("id_n"),
          dotCol.as("dot"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
    }, Some(s"""
      WITH $QVEC_SQL,
      c AS (
        SELECT qv.vec_id, qv.qv FROM qv
        JOIN documents dd ON dd.doc_id = qv.vec_id
        WHERE dd.lang != 'en'),
      dots AS (
        SELECT a.vec_id AS id_q, b.vec_id AS id_n,
               CAST(list_dot_product(CAST(a.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])) AS BIGINT) AS dot
        FROM qv a, c b
        WHERE a.vec_id % 50 = 0 AND a.vec_id != b.vec_id)
      SELECT id_q, id_n, dot, rn FROM (
        SELECT id_q, id_n, dot,
               row_number() OVER (PARTITION BY id_q
                                  ORDER BY dot DESC, id_n ASC) AS rn
        FROM dots) WHERE rn <= 3""")),

    // -- Matryoshka truncation quality (prefix-dim retrieval) ----------------
    // MRL-style embeddings promise that a 16-dim PREFIX of the 64-dim
    // vector retrieves almost as well at a quarter of the memory/compute —
    // this gate MEASURES that trade instead of assuming it: one corpus×
    // queries pass computes the full and prefix dots together, two
    // bounded windows rank each, and the per-query output carries the
    // top-5 overlap plus both top-1 picks. (On this synthetic corpus the
    // prefix carries ~1/4 of the signal, so overlap is low — the gate
    // pins the MEASUREMENT, which is what a real embedding eval needs.)
    Q("vec_matryoshka", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val q = qvec(s, d).filter(col("vec_id") % 50 === 0).as("a")
      val c = qvec(s, d).as("b")
      val wf = Window.partitionBy("id_q")
        .orderBy(col("dot_full").desc, col("id_n").asc)
      val wp = Window.partitionBy("id_q")
        .orderBy(col("dot_pre").desc, col("id_n").asc)
      c.join(broadcast(q), expr("a.vec_id != b.vec_id"))
        .select(col("a.vec_id").as("id_q"), col("b.vec_id").as("id_n"),
          long_dot(col("a.qv"), col("b.qv")).as("dot_full"),
          long_dot(expr("slice(a.qv, 1, 16)"), expr("slice(b.qv, 1, 16)"))
            .as("dot_pre"))
        .withColumn("rf", row_number().over(wf))
        .withColumn("rp", row_number().over(wp))
        .filter(col("rf") <= 5 || col("rp") <= 5)
        .groupBy("id_q")
        .agg(sum(when(col("rf") <= 5 && col("rp") <= 5, 1L).otherwise(0L))
          .as("n_overlap"),
          max(when(col("rf") === 1, col("id_n"))).as("full_top1"),
          max(when(col("rp") === 1, col("id_n"))).as("pre_top1"))
    }, Some(s"""
      WITH $QVEC_SQL,
      dots AS (
        SELECT a.vec_id AS id_q, b.vec_id AS id_n,
               CAST(list_dot_product(CAST(a.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])) AS BIGINT) AS dot_full,
               CAST(list_dot_product(CAST(a.qv[1:16] AS DOUBLE[]), CAST(b.qv[1:16] AS DOUBLE[])) AS BIGINT) AS dot_pre
        FROM qv a, qv b
        WHERE a.vec_id % 50 = 0 AND a.vec_id != b.vec_id),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY id_q
                    ORDER BY dot_full DESC, id_n ASC) AS rf,
                  row_number() OVER (PARTITION BY id_q
                    ORDER BY dot_pre DESC, id_n ASC) AS rp
        FROM dots)
      SELECT id_q,
             CAST(sum(CASE WHEN rf <= 5 AND rp <= 5 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_overlap,
             max(CASE WHEN rf = 1 THEN id_n END) AS full_top1,
             max(CASE WHEN rp = 1 THEN id_n END) AS pre_top1
      FROM r WHERE rf <= 5 OR rp <= 5 GROUP BY id_q""")),

    // -- LSH bucketing by deterministic hyperplane signs (the scale path) ----
    // hyperplane h (h=0..3) has components ((i*31 + h*17) % 7) - 3 over
    // dimension index i; bucket = 4-bit sign pattern; near-dup candidates are
    // same-bucket pairs — an equi-join, no cross product.
    Q("ann_lsh_bucket", (s, d) => {
      val planes = s.range(4).select(col("id").cast("int").as("h"))
      val sgn = qvec(s, d).crossJoin(broadcast(planes))
        .select(col("vec_id"), col("h"),
          expr("""aggregate(zip_with(qv, sequence(0, 63),
                    (x, i) -> x * (((i * 31 + h * 17) % 7) - 3)),
                  0L, (acc, v) -> acc + v)""").as("proj"))
        .groupBy("vec_id")
        .agg(sum(expr("IF(proj > 0, CAST(pow(2, h) AS BIGINT), 0L)")).as("bucket"))
      sgn.groupBy("bucket").agg(count(lit(1)).as("n_vectors"))
        .filter(col("n_vectors") > 1)
    }, Some(s"""
      WITH $QVEC_SQL,
      proj AS (
        SELECT vec_id, h,
               CAST(list_dot_product(CAST(qv AS DOUBLE[]),
                 CAST(list_transform(range(0, 64),
                   i -> ((i * 31 + h * 17) % 7) - 3) AS DOUBLE[])) AS BIGINT) AS proj
        FROM qv, (VALUES (0),(1),(2),(3)) hs(h)),
      buckets AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN proj > 0 THEN CAST(pow(2, h) AS BIGINT) ELSE 0 END)
                 AS BIGINT) AS bucket
        FROM proj GROUP BY vec_id)
      SELECT bucket, count(*) AS n_vectors FROM buckets
      GROUP BY bucket HAVING count(*) > 1""")),

    // Gram / covariance accumulation — the building block under PCA,
    // whitening, and linear probes: for every dim pair i ≤ j, the exact
    // Σ qᵢqⱼ over the quantized corpus, with the marginal sums joined on
    // (64 rows, broadcast) so the centered covariance NUMERATOR
    // n·Σqᵢqⱼ − Σqᵢ·Σqⱼ is itself an exact BIGINT. The cells come from
    // [[gramCells]]' per-partition d² accumulator — communication d² per
    // partition regardless of row count, no row inflation, exactly how a
    // 100 TB covariance pass must behave. (At extreme row counts the
    // scaled products approach int64; the decimal(38) widening is the
    // escape hatch, not needed at gate scale.)
    Q("vec_gram", (s, d) => {
      val cells = gramCells(s, d)
      val marg = Q.spreadSmallScan(tbl(s, d, "embeddings")
          .filter(col("embedding").isNotNull)) // the oracle's marg reads FROM qv
        .select(posexplode(expr(quant)).as(Seq("pos", "q")))
        .groupBy((col("pos") + 1).cast("long").as("dim"))
        .agg(sum("q").as("s_dim"))
      cells
        .join(broadcast(marg.withColumnRenamed("dim", "i")
          .withColumnRenamed("s_dim", "s_i")), "i")
        .join(broadcast(marg.withColumnRenamed("dim", "j")
          .withColumnRenamed("s_dim", "s_j")), "j")
        .withColumn("cov_num", expr("n * s_ij - s_i * s_j"))
        .select("i", "j", "n", "s_ij", "s_i", "s_j", "cov_num")
    }, Some(s"""
      WITH $QVEC_SQL,
      cells AS (
        SELECT s.i AS i, s.j AS j, count(*) AS n,
               CAST(sum(s.p) AS BIGINT) AS s_ij
        FROM (
          SELECT unnest(flatten(list_transform(range(1, 65), i ->
                   list_transform(range(i, 65), j ->
                     struct_pack(i := i, j := j, p := qv[i] * qv[j]))))) AS s
          FROM qv)
        GROUP BY 1, 2),
      marg AS (
        SELECT dim, CAST(sum(q) AS BIGINT) AS s_dim FROM (
          SELECT unnest(qv) AS q,
                 unnest(range(1, 65)) AS dim
          FROM qv)
        GROUP BY 1)
      SELECT c.i, c.j, c.n, c.s_ij, mi.s_dim AS s_i, mj.s_dim AS s_j,
             c.n * c.s_ij - mi.s_dim * mj.s_dim AS cov_num
      FROM cells c JOIN marg mi ON c.i = mi.dim
                   JOIN marg mj ON c.j = mj.dim""")),

    // PCA top component by power iteration — vec_gram's covariance cells
    // driven to the leading eigendirection, EXACTLY: three unrolled
    // iterations u ↦ normalize(C·u) where the matrix-vector product is an
    // exact decimal/HUGEINT sum over the 64×64 Gram relation and the
    // max-norm normalization is sign·(abs(v)·10^6 div max|v|) — the abs
    // keeps every division positive, where floor (DuckDB //) and
    // truncation (Spark div) agree, so each iterate is a BIGINT in
    // [-10^6, 10^6] with identical bits in both engines. The one
    // data-sized pass is the Gram aggregation (d²/2 partial-aggregated
    // cells per partition — the same communication shape as vec_gram);
    // every iteration after it touches only the 4096-cell matrix and a
    // 64-row vector, with the scalar max folded back as a broadcast 1-row
    // relation (the house scalar pattern).
    Q("vec_pca_power", (s, d) => {
      val cells = gramCells(s, d)
      val marg = Q.spreadSmallScan(tbl(s, d, "embeddings")
          .filter(col("embedding").isNotNull)) // the oracle's marg reads FROM qv
        .select(posexplode(expr(quant)).as(Seq("pos", "q")))
        .groupBy((col("pos") + 1).cast("long").as("dim"))
        .agg(sum("q").as("s_dim"))
      val upper = cells
        .join(broadcast(marg.withColumnRenamed("dim", "i")
          .withColumnRenamed("s_dim", "s_i")), "i")
        .join(broadcast(marg.withColumnRenamed("dim", "j")
          .withColumnRenamed("s_dim", "s_j")), "j")
        .select(col("i"), col("j"), expr("n * s_ij - s_i * s_j").as("c"))
      // The ONE data-sized pass is the Gram aggregation above; everything
      // after is d²-bounded (64×64 covariance cells + 64-row iterates), so
      // the 3-step power iteration folds DRIVER-SIDE over the collected
      // matrix — the same bounded-by-construction round-trip as the BPE
      // merge decision and sq_markov_removal's value iteration, replacing
      // 6 tiny cached jobs whose scheduling overhead dominated the query.
      // All arithmetic is exact integers (BigInt matvec == the oracle's
      // HUGEINT sums; floor-div on non-negative operands == DuckDB's //),
      // so the fold reproduces the oracle bit-for-bit.
      val up = upper.collect()
        .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2)))
      import s.implicits._
      if (up.isEmpty) {
        Seq.empty[(Long, Long, Long, Long)].toDF("dim", "u1", "u2", "u3")
      } else {
        val dims = up.flatMap(t => Seq(t._1, t._2)).distinct.sorted
        val dmax = dims.max
        val g = Array.ofDim[Long](dmax + 1, dmax + 1)
        up.foreach { case (i, j, c) => g(i)(j) = c; g(j)(i) = c }
        // a degenerate Gram (e.g. a single vector: every centered cell 0)
        // zeroes the iterate; DuckDB's `// 0` is NULL, and NULL then
        // propagates through every later step — mirror with None so the
        // fold still matches the oracle bit-for-bit (64 NULL rows, not a
        // driver ArithmeticException)
        def step(uo: Option[Map[Int, Long]]): Option[Map[Int, Long]] =
          uo.flatMap { u =>
            val v = dims.map { i =>
              i -> dims.foldLeft(BigInt(0))((acc, j) =>
                acc + BigInt(g(i)(j)) * u(j))
            }.toMap
            val mv = v.values.map(_.abs).max
            if (mv == 0) None
            else Some(v.map { case (i, x) =>
              i -> ((if (x < 0) -1 else 1) * (x.abs * 1000000 / mv)).toLong
            })
          }
        val u1 = step(Some(dims.map(_ -> 1L).toMap))
        val u2 = step(u1)
        val u3 = step(u2)
        dims.toSeq.map(i => (i.toLong,
            u1.map(_(i)), u2.map(_(i)), u3.map(_(i))))
          .toDF("dim", "u1", "u2", "u3")
      }
    }, Some(s"""
      WITH $QVEC_SQL,
      cells AS (
        SELECT s.i AS i, s.j AS j, count(*) AS n,
               CAST(sum(s.p) AS BIGINT) AS s_ij
        FROM (
          SELECT unnest(flatten(list_transform(range(1, 65), i ->
                   list_transform(range(i, 65), j ->
                     struct_pack(i := i, j := j, p := qv[i] * qv[j]))))) AS s
          FROM qv)
        GROUP BY 1, 2),
      marg AS (
        SELECT dim, CAST(sum(q) AS BIGINT) AS s_dim FROM (
          SELECT unnest(qv) AS q,
                 unnest(range(1, 65)) AS dim
          FROM qv)
        GROUP BY 1),
      up AS (
        SELECT c.i, c.j, c.n * c.s_ij - mi.s_dim * mj.s_dim AS c
        FROM cells c JOIN marg mi ON c.i = mi.dim
                     JOIN marg mj ON c.j = mj.dim),
      gram AS (
        SELECT i, j, c FROM up
        UNION ALL
        SELECT j AS i, i AS j, c FROM up WHERE i != j),
      u0 AS (SELECT dim, CAST(1 AS BIGINT) AS u FROM marg),
      v1 AS (SELECT g.i AS dim, sum(CAST(g.c AS HUGEINT) * u.u) AS v
             FROM gram g JOIN u0 u ON g.j = u.dim GROUP BY 1),
      m1 AS (SELECT max(abs(v)) AS mv FROM v1),
      w1 AS (SELECT dim, CAST((CASE WHEN v < 0 THEN -1 ELSE 1 END)
                              * (abs(v) * 1000000 // mv) AS BIGINT) AS u
             FROM v1, m1),
      v2 AS (SELECT g.i AS dim, sum(CAST(g.c AS HUGEINT) * u.u) AS v
             FROM gram g JOIN w1 u ON g.j = u.dim GROUP BY 1),
      m2 AS (SELECT max(abs(v)) AS mv FROM v2),
      w2 AS (SELECT dim, CAST((CASE WHEN v < 0 THEN -1 ELSE 1 END)
                              * (abs(v) * 1000000 // mv) AS BIGINT) AS u
             FROM v2, m2),
      v3 AS (SELECT g.i AS dim, sum(CAST(g.c AS HUGEINT) * u.u) AS v
             FROM gram g JOIN w2 u ON g.j = u.dim GROUP BY 1),
      m3 AS (SELECT max(abs(v)) AS mv FROM v3),
      w3 AS (SELECT dim, CAST((CASE WHEN v < 0 THEN -1 ELSE 1 END)
                              * (abs(v) * 1000000 // mv) AS BIGINT) AS u
             FROM v3, m3)
      SELECT w1.dim, w1.u AS u1, w2.u AS u2, w3.u AS u3
      FROM w1 JOIN w2 ON w1.dim = w2.dim JOIN w3 ON w1.dim = w3.dim"""))
  )
}
