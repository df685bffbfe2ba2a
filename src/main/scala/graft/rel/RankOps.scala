package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q.tbl

/** Graph ranking over the customer-supplier interaction graph — the
  * corpus-weighting signal a training-data pipeline derives from link
  * structure (domain ranking a la CommonCrawl) expressed on the TPC-H
  * relations: nodes are customers and (offset) suppliers, one undirected
  * edge per distinct customer-supplier trade.
  *
  * PageRank runs THREE fixed iterations in scaled-integer arithmetic
  * (damping 0.85 as 850/1000, rank scale 1e6) so both engines compute
  * bit-identical BIGINTs: every quantity stays a non-negative integer,
  * where floor division and truncating division coincide — the same
  * exactness discipline as the rest of the harness. Fixed iteration count
  * keeps the plan finite and the oracle expressible as unrolled CTEs.
  *
  * Scale shape: the edge relation is built once and cached for the three
  * contribution joins; each iteration is one equi-join + one map-side-
  * combinable sum per destination. Hub suppliers make the contribution
  * aggregate skewed — AQE skew handling applies; the rank relation itself
  * stays node-sized.
  */
object RankOps {

  def pagerank(s: SparkSession, d: String): DataFrame = {
    val ed = tbl(s, d, "orders")
      .join(tbl(s, d, "lineitem"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("a"),
        (col("l_suppkey") + lit(1000000L)).as("b"))
      .distinct()
    val edges = ed.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(ed.select(col("b").as("src"), col("a").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val withDeg = edges.join(deg, "src")
    var pr = deg.select(col("src").as("node"),
      lit(1000000L).as("pr"))
    for (_ <- 1 to 3) {
      val contrib = withDeg
        .join(pr, col("src") === col("node"))
        .select(col("dst").as("node2"), expr("pr div outdeg").as("c"))
        .groupBy("node2")
        .agg(sum("c").cast("long").as("m"))
      pr = pr.join(contrib, col("node") === col("node2"), "left")
        .select(col("node"),
          expr("CAST(150000 + (850 * coalesce(m, 0)) div 1000 AS BIGINT)")
            .as("pr"))
    }
    graft.Caching.releaseAfterAction(pr, withDeg)
  }

  private val PAGERANK_SQL = """
      WITH ed AS (
        SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      edges AS (
        SELECT a AS src, b AS dst FROM ed
        UNION ALL SELECT b, a FROM ed),
      deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
      pr0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
      c1 AS (SELECT e.dst AS node2, CAST(sum(p.pr // d.outdeg) AS BIGINT) AS m
             FROM edges e JOIN pr0 p ON e.src = p.node
                          JOIN deg d ON e.src = d.src
             GROUP BY e.dst),
      pr1 AS (SELECT p.node,
                     CAST(150000 + (850 * coalesce(c.m, 0)) // 1000 AS BIGINT) AS pr
              FROM pr0 p LEFT JOIN c1 c ON p.node = c.node2),
      c2 AS (SELECT e.dst AS node2, CAST(sum(p.pr // d.outdeg) AS BIGINT) AS m
             FROM edges e JOIN pr1 p ON e.src = p.node
                          JOIN deg d ON e.src = d.src
             GROUP BY e.dst),
      pr2 AS (SELECT p.node,
                     CAST(150000 + (850 * coalesce(c.m, 0)) // 1000 AS BIGINT) AS pr
              FROM pr1 p LEFT JOIN c2 c ON p.node = c.node2),
      c3 AS (SELECT e.dst AS node2, CAST(sum(p.pr // d.outdeg) AS BIGINT) AS m
             FROM edges e JOIN pr2 p ON e.src = p.node
                          JOIN deg d ON e.src = d.src
             GROUP BY e.dst),
      pr3 AS (SELECT p.node,
                     CAST(150000 + (850 * coalesce(c.m, 0)) // 1000 AS BIGINT) AS pr
              FROM pr2 p LEFT JOIN c3 c ON p.node = c.node2)
      SELECT node, pr FROM pr3"""

  /** Personalized PageRank — the recommendation variant: teleport mass
    * returns ONLY to the seed set (every 100th customer), so scores rank
    * proximity TO THE SEEDS rather than global centrality. Same
    * scaled-integer determinism contract and per-round equi-join +
    * hash-aggregate shape as [[pagerank]]; only the teleport term is
    * seed-conditional. A production recommender runs one PPR per user
    * cohort off the same cached edge relation.
    */
  def ppr(s: SparkSession, d: String): DataFrame = {
    val ed = tbl(s, d, "orders")
      .join(tbl(s, d, "lineitem"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("a"),
        (col("l_suppkey") + lit(1000000L)).as("b"))
      .distinct()
    val edges = ed.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(ed.select(col("b").as("src"), col("a").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val withDeg = edges.join(deg, "src")
    val seed = expr("IF(node < 1000000 AND node % 100 = 0, 1, 0)")
    var pr = deg.select(col("src").as("node"))
      .select(col("node"), (seed * 1000000L).as("pr"))
    for (_ <- 1 to 3) {
      val contrib = withDeg
        .join(pr, col("src") === col("node"))
        .select(col("dst").as("node2"), expr("pr div outdeg").as("c"))
        .groupBy("node2")
        .agg(sum("c").cast("long").as("m"))
      pr = pr.join(contrib, col("node") === col("node2"), "left")
        .select(col("node"),
          (seed * 150000L +
            expr("(850 * coalesce(m, 0)) div 1000")).cast("long").as("pr"))
    }
    graft.Caching.releaseAfterAction(pr, withDeg)
  }

  private val PPR_SQL: String = {
    val seed = "CASE WHEN %s < 1000000 AND %s %% 100 = 0 THEN 1 ELSE 0 END"
    val rounds = (1 to 3).map { r =>
      s"""
      c$r AS (SELECT e.dst AS node2, CAST(sum(p.pr // d.outdeg) AS BIGINT) AS m
             FROM edges e JOIN pr${r - 1} p ON e.src = p.node
                          JOIN deg d ON e.src = d.src
             GROUP BY e.dst),
      pr$r AS (SELECT p.node,
                     CAST(${seed.format("p.node", "p.node")} * 150000
                          + (850 * coalesce(c.m, 0)) // 1000 AS BIGINT) AS pr
              FROM pr${r - 1} p LEFT JOIN c$r c ON p.node = c.node2)"""
    }.mkString(",")
    s"""
      WITH ed AS (
        SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      edges AS (
        SELECT a AS src, b AS dst FROM ed
        UNION ALL SELECT b, a FROM ed),
      deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
      pr0 AS (SELECT src AS node,
                     CAST(${seed.format("src", "src")} * 1000000 AS BIGINT)
                       AS pr
              FROM deg),
      $rounds
      SELECT node, pr FROM pr3"""
  }

  /** Deterministic random-walk corpus — the DeepWalk/node2vec data-prep
    * step: from every seed (each 100th customer), a 4-step walk where
    * each step picks the out-edge minimizing md5(node:step:dst) — a
    * hash-derived pseudo-random choice BOTH engines compute identically,
    * so the walk corpus is exactly replayable (the property a resumable
    * 100 TB walk job needs anyway: re-generated walks must not drift
    * between attempts). Each step is one edge equi-join + per-walk argmin;
    * walks advance in lockstep, shuffled by walk id.
    */
  def randomWalks(s: SparkSession, d: String): DataFrame = {
    val ed = tbl(s, d, "orders")
      .join(tbl(s, d, "lineitem"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("a"),
        (col("l_suppkey") + lit(1000000L)).as("b"))
      .distinct()
    val edges = ed.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(ed.select(col("b").as("src"), col("a").as("dst")))
    var cur = edges.select(col("src").as("node")).distinct()
      .filter(col("node") < 1000000L && col("node") % 100 === 0)
      .select(col("node").as("start"), lit(0L).as("step"), col("node"))
    var acc = cur
    for (step <- 1 to 4) {
      cur = cur.join(edges, cur("node") === edges("src"))
        .select(col("start"),
          md5(concat_ws(":", cur("node"), lit(step), col("dst"))).as("h"),
          col("dst"))
        .groupBy("start")
        .agg(min(struct(col("h"), col("dst"))).as("m"))
        .select(col("start"), lit(step.toLong).as("step"),
          col("m.dst").as("node"))
      acc = acc.unionByName(cur)
    }
    acc
  }

  private val WALKS_SQL: String = {
    val steps = (1 to 4).map { st =>
      s"""
      j$st AS (
        SELECT c.start, e.dst,
               row_number() OVER (PARTITION BY c.start
                 ORDER BY md5(c.node || ':' || $st || ':' || e.dst),
                          e.dst) AS rn
        FROM c${st - 1} c JOIN edges e ON c.node = e.src),
      c$st AS (SELECT start, CAST($st AS BIGINT) AS step, dst AS node
               FROM j$st WHERE rn = 1)"""
    }.mkString(",")
    s"""
      WITH ed AS (
        SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      edges AS (
        SELECT a AS src, b AS dst FROM ed
        UNION ALL SELECT b, a FROM ed),
      c0 AS (
        SELECT DISTINCT src AS start, CAST(0 AS BIGINT) AS step,
               src AS node
        FROM edges WHERE src < 1000000 AND src % 100 = 0),
      $steps
      SELECT start, step, node FROM c0
      UNION ALL SELECT start, step, node FROM c1
      UNION ALL SELECT start, step, node FROM c2
      UNION ALL SELECT start, step, node FROM c3
      UNION ALL SELECT start, step, node FROM c4"""
  }

  /** Hamilton (largest-remainder) allocation of `budget` units across
    * sources proportional to whitespace-token mass: floor quota plus
    * remainder rank, so the allocations sum EXACTLY to the budget and all
    * arithmetic is integer (bit-identical across engines; ties rank by
    * source name). The windows run over the per-source aggregate — one row
    * per corpus source, metadata-sized at any corpus scale. `mixWeights`
    * publishes the allocation; `mixApply` spends it.
    */
  private def hamilton(s: SparkSession, d: String, budget: Long): DataFrame = {
    val perSource = tbl(s, d, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("toks"))
      .groupBy("source").agg(sum("toks").as("tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("source"))
    perSource
      .withColumn("total", sum("tokens").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("floor_alloc", expr(s"$budget * tokens div total"))
      .withColumn("rem", expr(s"$budget * tokens % total"))
      .withColumn("rk", row_number().over(w))
      .withColumn("extra", expr(s"$budget - sum(floor_alloc) OVER ()"))
      .select(col("source"), col("tokens"),
        (col("floor_alloc") +
          when(col("rk") <= col("extra"), 1L).otherwise(0L)).as("alloc"))
  }

  def mixWeights(s: SparkSession, d: String): DataFrame =
    hamilton(s, d, 1000000L)

  /** Apply the mixture: per source, documents are taken in stream order
    * until that source's Hamilton token budget is exhausted (whole docs,
    * no splitting) — the sampling step that turns mixture weights into an
    * actual sub-corpus. The cumulative-sum window partitions by source
    * (bounded partitions); the allocation side is metadata-sized. Output
    * is the per-source composition: how many docs and tokens the budget
    * admitted.
    */
  def mixApply(s: SparkSession, d: String): DataFrame = {
    val budget = 10000L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val toks = tbl(s, d, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("nt"))
    toks.withColumn("cum", sum("nt").over(w))
      .join(hamilton(s, d, budget).select(col("source"), col("alloc")), "source")
      .withColumn("taken", (col("cum") <= col("alloc")).cast("long"))
      .groupBy("source", "alloc")
      .agg(count(lit(1)).as("n_docs"), sum("taken").as("n_taken"),
        sum(when(col("taken") === 1, col("nt")).otherwise(0L)).as("tokens_taken"))
      .select(col("source"), col("alloc"), col("n_docs"), col("n_taken"),
        col("tokens_taken"))
  }

  private val MIX_APPLY_SQL = """
      WITH ps AS (
        SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
        FROM documents GROUP BY source),
      q AS (
        SELECT source, tokens,
               CAST(sum(tokens) OVER () AS BIGINT) AS total
        FROM ps),
      fl AS (
        SELECT source, tokens,
               10000 * tokens // total AS floor_alloc,
               10000 * tokens % total AS rem
        FROM q),
      rk AS (
        SELECT source, floor_alloc,
               row_number() OVER (ORDER BY rem DESC, source) AS rk,
               10000 - CAST(sum(floor_alloc) OVER () AS BIGINT) AS extra
        FROM fl),
      al AS (
        SELECT source,
               CAST(floor_alloc + (CASE WHEN rk <= extra THEN 1 ELSE 0 END)
                    AS BIGINT) AS alloc
        FROM rk),
      tk AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
               CAST(sum(len(string_split(text, ' ')))
                 OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum
        FROM documents)
      SELECT tk.source, al.alloc,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN tk.cum <= al.alloc THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_taken,
             CAST(sum(CASE WHEN tk.cum <= al.alloc THEN tk.nt ELSE 0 END)
                  AS BIGINT) AS tokens_taken
      FROM tk JOIN al ON tk.source = al.source
      GROUP BY tk.source, al.alloc"""

  private val MIX_WEIGHTS_SQL = """
      WITH ps AS (
        SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
        FROM documents GROUP BY source),
      q AS (
        SELECT source, tokens,
               CAST(sum(tokens) OVER () AS BIGINT) AS total
        FROM ps),
      fl AS (
        SELECT source, tokens,
               1000000 * tokens // total AS floor_alloc,
               1000000 * tokens % total AS rem
        FROM q),
      rk AS (
        SELECT source, tokens, floor_alloc,
               row_number() OVER (ORDER BY rem DESC, source) AS rk,
               1000000 - CAST(sum(floor_alloc) OVER () AS BIGINT) AS extra
        FROM fl)
      SELECT source, tokens,
             CAST(floor_alloc + (CASE WHEN rk <= extra THEN 1 ELSE 0 END)
                  AS BIGINT) AS alloc
      FROM rk"""

  /** Label-propagation community detection — the domain-clustering signal a
    * corpus pipeline uses to group near-identical sources before mixture
    * weighting. Three SYNCHRONOUS rounds over the same customer-supplier
    * graph as [[pagerank]]: every node adopts its neighbors' most frequent
    * label, ties to the smallest label, starting from self-labels. The
    * per-round argmax is an aggregate (`max(struct(cnt, -lbl))`), never a
    * window over the corpus; the edge relation is cached across the three
    * contribution joins. Output is community-aggregated (label, size,
    * member id sum/min) so the gate is stable at any node count.
    *
    * Scale shape: each round is one equi-join on src + two map-side-
    * combinable aggregates keyed by (dst, lbl) then dst — the same skew
    * and shuffle profile as a pagerank iteration; label relations stay
    * node-sized.
    */
  /** The sparsified purchase graph plus its 3-round label-propagation
    * assignment — shared by gr_labelprop (community census) and
    * gr_modularity (partition-quality score). Returns (undirected pairs,
    * directed edges, node→label).
    */
  private def lpGraph(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    // sparsify to the rare low-quantity trades: the dense bipartite graph
    // collapses to one giant community, the sparse one has real structure
    val ed = tbl(s, d, "orders")
      .join(tbl(s, d, "lineitem").filter(col("l_quantity") <= 2),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("a"),
        (col("l_suppkey") + lit(1000000L)).as("b"))
      .distinct()
    val edges = ed.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(ed.select(col("b").as("src"), col("a").as("dst")))
    var lbl = edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
    for (_ <- 1 to 3) {
      lbl = edges.join(lbl, col("src") === col("node"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("dst").as("node"), (-col("m.nl")).as("lbl"))
    }
    (ed, edges, lbl)
  }

  def labelProp(s: SparkSession, d: String): DataFrame = {
    val (_, edges, lbl) = lpGraph(s, d)
    val out = lbl.groupBy("lbl")
      .agg(count(lit(1)).as("n_members"), sum("node").cast("long").as("id_sum"),
        min("node").as("id_min"))
    graft.Caching.releaseAfterAction(out, edges)
  }

  /** Newman modularity of the label-propagation partition, per community
    * and exact: Q = Σ_c (e_c/m − (d_c/2m)²) over undirected edge count m,
    * intra-community edge count e_c, and community degree sum d_c — all
    * exact BIGINTs (the double contribution is one shared-text formula
    * over them). The partition-quality check every community detection
    * run ships with.
    *
    * At 100 TB: two node-sized label joins onto the undirected pair
    * relation, one degree aggregate, and a broadcast 1-row m fold — the
    * assignment relation (cached) is the only thing read more than once.
    */
  def modularity(s: SparkSession, d: String): DataFrame = {
    val (ed, edges, lbl) = lpGraph(s, d)
    val m1 = ed.groupBy().agg(count(lit(1)).as("m"))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val dc = deg.join(lbl, col("src") === col("node"))
      .groupBy("lbl").agg(sum("deg").as("dc"))
    val ec = ed
      .join(lbl.select(col("node").as("a"), col("lbl").as("ca")), "a")
      .join(lbl.select(col("node").as("b"), col("lbl").as("cb")), "b")
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("lbl")).agg(count(lit(1)).as("ec"))
    val out = dc.join(ec, Seq("lbl"), "left")
      .withColumn("ec", coalesce(col("ec"), lit(0L)))
      .crossJoin(broadcast(m1))
      .withColumn("contrib", expr(MOD_EXPR))
      .select("lbl", "ec", "dc", "m", "contrib")
    // ed (the orders⋈lineitem distinct-pair join) feeds edges, m1 AND ec —
    // cache it too or the data-sized join runs three times
    graft.Caching.releaseAfterAction(out, ed, edges, lbl)
  }

  /** Degree assortativity of the sparsified purchase graph — Newman's
    * r: the Pearson correlation of endpoint degrees over the directed
    * edge list (each undirected edge contributes both orientations, the
    * standard symmetrization). Negative r is the disassortative
    * hub-to-leaf shape typical of bipartite commerce graphs. Every
    * moment is an exact BIGINT from two node-sized degree joins onto the
    * cached edge relation; r is one shared-text formula.
    */
  def assortativity(s: SparkSession, d: String): DataFrame = {
    val (_, edges, _) = lpGraph(s, d) // lbl is lazy and unused: zero cost
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val out = edges
      .join(deg.select(col("node").as("src"), col("deg").as("dx")), "src")
      .join(deg.select(col("node").as("dst"), col("deg").as("dy")), "dst")
      .groupBy()
      .agg(count(lit(1)).as("n"),
        sum("dx").as("sx"), sum("dy").as("sy"),
        sum(col("dx") * col("dy")).as("sxy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"))
      .withColumn("r", expr(
        "(n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))"))
    graft.Caching.releaseAfterAction(out, edges, deg)
  }

  // lazy: LP_CTES is declared further down; `all` is a def, so this
  // resolves at registration time with every val initialized
  private lazy val ASSORT_SQL = LP_CTES + s""",
      deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
      j AS (
        SELECT a.deg AS dx, b.deg AS dy
        FROM edges e JOIN deg a ON e.src = a.node
                     JOIN deg b ON e.dst = b.node)
      SELECT count(*) AS n,
             CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
             CAST(sum(dx*dy) AS BIGINT) AS sxy,
             CAST(sum(dx*dx) AS BIGINT) AS sxx,
             CAST(sum(dy*dy) AS BIGINT) AS syy,
             (count(*)*CAST(sum(dx*dy) AS BIGINT)
                - CAST(sum(dx) AS BIGINT)*CAST(sum(dy) AS BIGINT))
             / (sqrt(count(*)*CAST(sum(dx*dx) AS BIGINT)
                - CAST(sum(dx) AS BIGINT)*CAST(sum(dx) AS BIGINT))
                * sqrt(count(*)*CAST(sum(dy*dy) AS BIGINT)
                - CAST(sum(dy) AS BIGINT)*CAST(sum(dy) AS BIGINT))) AS r
      FROM j"""

  /** Per-community modularity contribution — shared text, both engines.
    * `4e0`, NOT `4.0`: Spark parses a `d.d` literal as DECIMAL and would
    * run the whole term through decimal rounding (≈25 ulps off DuckDB's
    * double path); the exponent form is a DOUBLE literal in both engines,
    * and 4·m·m is exact in doubles below 2^26 edges.
    */
  private val MOD_EXPR = "ec / m - (dc * dc) / (4e0 * m * m)"

  private def lpRoundSql(prev: String, out: String): String = s"""
      $out AS (
        SELECT dst AS node, lbl FROM (
          SELECT e.dst, l.lbl, count(*) AS c,
                 row_number() OVER (PARTITION BY e.dst
                                    ORDER BY count(*) DESC, l.lbl) AS rn
          FROM edges e JOIN $prev l ON e.src = l.node
          GROUP BY e.dst, l.lbl)
        WHERE rn = 1)"""

  private val LP_CTES = s"""
      WITH ed AS (
        SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_quantity <= 2),
      edges AS (
        SELECT a AS src, b AS dst FROM ed
        UNION ALL SELECT b, a FROM ed),
      l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
      ${lpRoundSql("l0", "l1")},
      ${lpRoundSql("l1", "l2")},
      ${lpRoundSql("l2", "l3")}"""

  private val LABELPROP_SQL = LP_CTES + s"""
      SELECT lbl, CAST(count(*) AS BIGINT) AS n_members,
             CAST(sum(node) AS BIGINT) AS id_sum,
             CAST(min(node) AS BIGINT) AS id_min
      FROM l3 GROUP BY lbl"""

  private val MODULARITY_SQL = LP_CTES + s""",
      m1 AS (SELECT count(*) AS m FROM ed),
      deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
      dc AS (
        SELECT l.lbl, CAST(sum(d.deg) AS BIGINT) AS dc
        FROM deg d JOIN l3 l ON d.src = l.node GROUP BY 1),
      ec AS (
        SELECT la.lbl AS lbl, count(*) AS ec
        FROM ed JOIN l3 la ON ed.a = la.node
                JOIN l3 lb ON ed.b = lb.node
        WHERE la.lbl = lb.lbl GROUP BY 1),
      base AS (
        SELECT dc.lbl AS lbl, CAST(coalesce(ec.ec, 0) AS BIGINT) AS ec,
               dc.dc AS dc, m1.m AS m
        FROM dc LEFT JOIN ec ON dc.lbl = ec.lbl CROSS JOIN m1)
      SELECT lbl, ec, dc, m, $MOD_EXPR AS contrib FROM base"""

  /** HITS hubs/authorities on the directed customer -> supplier purchase
    * graph (two full mutual-reinforcement rounds): auth(b) = sum of hub
    * scores over in-edges, hub(a) = sum of auth scores over out-edges, each
    * side re-normalized after every half-step by its MAX — scaled-integer
    * throughout ((x * 1e6) div max, all positive, so DuckDB's floor `//`
    * and Spark's truncating `div` agree) in place of the float L2 norm, the
    * same determinism trade PageRank above makes with its damping term.
    *
    * At 100 TB: per round, two edge-keyed equi-join + hash-aggregate passes
    * (map-side combinable) over the CACHED distinct edge relation, plus a
    * 1-row max scalar per half-step collected from the cached node-sized
    * relation — no windows, no driver loops over data, node relations stay
    * node-sized. Round count is fixed (2), the standard budget-bounded
    * form for relational HITS.
    */
  def hits(s: SparkSession, d: String): DataFrame = {
    val ed = tbl(s, d, "orders")
      .join(tbl(s, d, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(1000000L)).as("dst"))
      .distinct()
    // Round-1 strength reduction (optimization round 17): h0 is the
    // CONSTANT 1000000 on exactly the distinct srcs of `ed`, and every
    // edge's src is by construction in that set — so round 1's
    // ed ⋈ h0 → sum(h) is algebraically count(*) × 1000000 per dst. The
    // first half-step therefore skips building/joining the h0 relation
    // entirely (one distinct exchange + one join removed; bit-identical
    // integers, gate re-certified vs the oracle). `hub` is None only for
    // that first half-step; later rounds carry the real normalized scores.
    var hub: Option[DataFrame] = None
    var auth: DataFrame = null
    // every per-round relation feeds TWO consumers (its max aggregate and
    // the next half-step) — each is persisted EAGERLY because the max is
    // collected as a 1-row scalar and folded into the next half-step as a
    // LITERAL divisor (what any engine does with an uncorrelated scalar
    // subquery). The previous crossJoin(broadcast(agg(max))) form kept the
    // query lazy but doubled the lineage under every half-step — by round
    // 2 the composed plan carried ~127 duplicated cache scans and planning
    // dwarfed the actual node-sized work (3.1 s warm vs pagerank's 1.2 s).
    val deps = scala.collection.mutable.ArrayBuffer[DataFrame](ed.persist())
    try {
      for (_ <- 1 to 2) {
        val a = (hub match {
          case None =>
            ed.groupBy("dst").agg((count(lit(1)) * 1000000L).as("a"))
          case Some(hb) =>
            ed.join(hb, col("src") === col("node"))
              .groupBy("dst").agg(sum("h").as("a"))
        }).persist()
        deps += a
        // max over an empty slice is NULL; the divisor is then never applied
        // to any row, so 1 keeps the fold total (result: zero hub/auth rows)
        val amaxRow = a.agg(max("a")).collect()(0)
        val amax = if (amaxRow.isNullAt(0)) 1L else amaxRow.getLong(0)
        auth = a.select(col("dst"), expr(s"(a * 1000000) div $amax").as("a"))
        val h = ed.join(auth.withColumnRenamed("dst", "dst2"),
            col("dst") === col("dst2"))
          .groupBy("src").agg(sum("a").as("h")).persist()
        deps += h
        val hmaxRow = h.agg(max("h")).collect()(0)
        val hmax = if (hmaxRow.isNullAt(0)) 1L else hmaxRow.getLong(0)
        hub = Some(h.select(col("src").as("node"),
          expr(s"(h * 1000000) div $hmax").as("h")))
      }
    } catch {
      case e: Throwable =>
        deps.foreach(_.unpersist(blocking = false)); throw e
    }
    val out = hub.get.select(col("node"), lit("hub").as("side"),
        col("h").as("score"))
      .unionByName(auth.select(col("dst").as("node"), lit("auth").as("side"),
        col("a").as("score")))
    graft.Caching.releaseAfterAction(out, deps.toSeq: _*)
  }

  // MATERIALIZED on every CTE (round 16): each normalization level
  // references its predecessor TWICE (the scalar max() subquery plus the
  // outer scan), so an inlining engine re-derives the 6-level chain
  // 2^6 times from the multi-million-edge base join — measured as
  // CPU-hours on the 10x mirror, where the fenced form runs in 34 s with
  // bit-identical output. Pure optimizer fence (DuckDB/Postgres keyword);
  // the relational content is unchanged.
  private val HITS_SQL = """
      WITH ed AS MATERIALIZED (
        SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      h0 AS MATERIALIZED (SELECT DISTINCT src AS node, CAST(1000000 AS BIGINT) AS h FROM ed),
      a1 AS MATERIALIZED (SELECT e.dst, CAST(sum(h.h) AS BIGINT) AS a
             FROM ed e JOIN h0 h ON e.src = h.node GROUP BY e.dst),
      a1n AS MATERIALIZED (SELECT dst, (a * 1000000) // (SELECT max(a) FROM a1) AS a FROM a1),
      h1 AS MATERIALIZED (SELECT e.src, CAST(sum(a.a) AS BIGINT) AS h
             FROM ed e JOIN a1n a ON e.dst = a.dst GROUP BY e.src),
      h1n AS MATERIALIZED (SELECT src AS node, (h * 1000000) // (SELECT max(h) FROM h1) AS h
              FROM h1),
      a2 AS MATERIALIZED (SELECT e.dst, CAST(sum(h.h) AS BIGINT) AS a
             FROM ed e JOIN h1n h ON e.src = h.node GROUP BY e.dst),
      a2n AS MATERIALIZED (SELECT dst, (a * 1000000) // (SELECT max(a) FROM a2) AS a FROM a2),
      h2 AS MATERIALIZED (SELECT e.src, CAST(sum(a.a) AS BIGINT) AS h
             FROM ed e JOIN a2n a ON e.dst = a.dst GROUP BY e.src),
      h2n AS MATERIALIZED (SELECT src AS node, (h * 1000000) // (SELECT max(h) FROM h2) AS h
              FROM h2)
      SELECT node, 'hub' AS side, h AS score FROM h2n
      UNION ALL
      SELECT dst, 'auth', a FROM a2n"""

  /** Bounded k-core peeling (k=4, 4 rounds) on the SPARSIFIED purchase
    * graph (l_quantity <= 2, the gr_labelprop sparsification — the dense
    * graph degenerates to a plain degree filter). Each round drops nodes
    * whose degree among SURVIVORS is < k; fixed round count keeps the
    * DuckDB oracle unrollable and bounds the job (the full k-core is the
    * fixpoint; bounded peeling is the standard budgeted form and already
    * a valid upper-bound filter for web-graph spam/quality pruning).
    * Output: surviving nodes with their round-4 residual degree.
    *
    * At 100 TB: per round two equi-joins of the CACHED edge relation
    * against the shrinking survivor set plus one count aggregate — no
    * windows, no driver-side data; the survivor relation is node-sized.
    */
  def kcore(s: SparkSession, d: String): DataFrame = {
    val K = 4
    val ed = tbl(s, d, "orders")
      .join(tbl(s, d, "lineitem").filter(col("l_quantity") <= 2),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("a"),
        (col("l_suppkey") + lit(1000000L)).as("b"))
      .distinct()
    val edges = ed.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(ed.select(col("b").as("src"), col("a").as("dst")))
    // Round-1 strength reduction (optimization round 17): the initial
    // survivor set is the distinct endpoints of the symmetrized edge list,
    // so both round-1 semi-joins are no-op filters (every src AND every dst
    // is in it — `edges` is the union of both directions). Round 1 is
    // therefore a plain degree count; the endpoint distinct and two joins
    // are never built. Bit-identical survivors, gate re-certified.
    var alive: Option[DataFrame] = None
    var out: DataFrame = null
    // each survivor set feeds BOTH endpoint joins of the next round —
    // persist per round or the reuse compounds into 2^rounds re-execution
    val deps = scala.collection.mutable.ArrayBuffer[DataFrame](edges)
    for (_ <- 1 to 4) {
      out = (alive match {
        case None => edges
        case Some(al) => edges
          .join(al, col("src") === col("node")).drop("node")
          .join(al.withColumnRenamed("node", "node2"),
            col("dst") === col("node2"))
      })
        .groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= K)
        .select(col("src").as("node"), col("deg"))
      deps += out
      alive = Some(out.select("node"))
    }
    graft.Caching.releaseAfterAction(out, deps.toSeq: _*)
  }

  private val KCORE_SQL = {
    val sb = new StringBuilder(
      """
      WITH ed AS (
        SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_quantity <= 2),
      edges AS (
        SELECT a AS src, b AS dst FROM ed
        UNION ALL SELECT b, a FROM ed),
      a0 AS (SELECT DISTINCT src AS node FROM edges)""")
    for (r <- 1 to 4) {
      sb.append(s""",
      d$r AS (SELECT e.src AS node, CAST(count(*) AS BIGINT) AS deg
              FROM edges e JOIN a${r - 1} x ON e.src = x.node
                           JOIN a${r - 1} y ON e.dst = y.node
              GROUP BY e.src),
      a$r AS (SELECT node, deg FROM d$r WHERE deg >= 4)""")
    }
    sb.append(" SELECT node, deg FROM a4").toString
  }

  /** Bounded multi-source BFS (3 rounds) on the sparsified purchase graph:
    * seeds are customers with custkey % 100 == 0 at hop 0; each round the
    * frontier's neighbors join at hop r and a min-hop aggregate folds them
    * in. Output: every node within 3 hops of a seed with its hop distance
    * (9 / 15 / 330 / 85 nodes at hops 0-3, sf0.01).
    *
    * At 100 TB: per round one equi-join of the CACHED edge relation
    * against the hop relation plus one node-keyed min aggregate
    * (map-side combinable); the hop relation is node-sized and its
    * per-round persist truncates the growing lineage. Fixed rounds keep
    * the oracle unrollable (full BFS = iterate to fixpoint, the
    * dd_components driver-loop pattern).
    */
  def bfs(s: SparkSession, d: String): DataFrame = {
    val ed = tbl(s, d, "orders")
      .join(tbl(s, d, "lineitem").filter(col("l_quantity") <= 2),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("a"),
        (col("l_suppkey") + lit(1000000L)).as("b"))
      .distinct()
    val edges = ed.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(ed.select(col("b").as("src"), col("a").as("dst")))
    var hops = edges.filter(col("src") < 1000000L && col("src") % 100 === 0)
      .select(col("src").as("node")).distinct()
      .withColumn("hop", lit(0L))
    val deps = scala.collection.mutable.ArrayBuffer[DataFrame](edges)
    for (r <- 1 to 3) {
      val nxt = edges.join(hops, col("src") === col("node"))
        .select(col("dst").as("node"), lit(r.toLong).as("hop"))
      hops = hops.unionByName(nxt).groupBy("node").agg(min("hop").as("hop"))
      deps += hops
    }
    graft.Caching.releaseAfterAction(hops, deps.toSeq: _*)
  }

  private val BFS_SQL = {
    val sb = new StringBuilder(
      """
      WITH ed AS (
        SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_quantity <= 2),
      edges AS (
        SELECT a AS src, b AS dst FROM ed
        UNION ALL SELECT b, a FROM ed),
      h0 AS (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS hop
             FROM edges WHERE src < 1000000 AND src % 100 = 0)""")
    for (r <- 1 to 3) {
      sb.append(s""",
      n$r AS (SELECT e.dst AS node, CAST($r AS BIGINT) AS hop
              FROM edges e JOIN h${r - 1} h ON e.src = h.node),
      h$r AS (SELECT node, min(hop) AS hop
              FROM (SELECT * FROM h${r - 1} UNION ALL SELECT * FROM n$r)
              GROUP BY node)""")
    }
    sb.append(" SELECT node, hop FROM h3").toString
  }

  /** Link prediction on the sparsified purchase graph (`l_quantity <= 2`,
    * the gr_labelprop/gr_kcore sparsification): for every customer pair
    * sharing >= 2 suppliers, the three classic common-neighbor scores —
    * raw common-neighbor count, Jaccard (scaled-integer ratio over the
    * degree union), and the Resource-Allocation index (Zhou et al. 2009:
    * sum of 1/deg(shared neighbor) — the log-free member of the
    * Adamic-Adar family, so it stays EXACT in scaled integers; a `div`
    * per shared neighbor, both engines floor identically on positives).
    *
    * At 100 TB: candidate pairs come ONLY from the equi-self-join on the
    * shared-neighbor key, whose fan-out the sparsification bounds (the
    * standard drop-super-hubs discipline for neighborhood self-joins —
    * same reason dd_minhash_lsh bands and dd_simhash byte-blocks exist);
    * the pair aggregate is map-side combinable, and the two degree joins
    * are node-sized. No windows, no cartesian.
    */
  def linkpred(s: SparkSession, d: String): DataFrame = {
    val ed = tbl(s, d, "orders")
      .join(tbl(s, d, "lineitem").filter(col("l_quantity") <= 2),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
      .distinct()
    val cdeg = ed.groupBy("c").agg(count(lit(1)).as("dc"))
    val sdeg = ed.groupBy("sk").agg(count(lit(1)).as("ds"))
    val withS = ed.join(sdeg, "sk")
    val pairs = withS.alias("e1")
      .join(withS.alias("e2"),
        col("e1.sk") === col("e2.sk") && col("e1.c") < col("e2.c"))
      .select(col("e1.c").as("a"), col("e2.c").as("b"),
        expr("1000000 div e1.ds").as("inv"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("cn"), sum("inv").cast("long").as("ra_scaled"))
      .filter(col("cn") >= 2)
    pairs
      .join(cdeg.select(col("c").as("a"), col("dc").as("da")), "a")
      .join(cdeg.select(col("c").as("b"), col("dc").as("db")), "b")
      .select(col("a"), col("b"), col("cn"), col("da"), col("db"),
        expr("(cn * 1000000) div (da + db - cn)").as("jaccard_scaled"),
        col("ra_scaled"))
  }

  private val LINKPRED_SQL = """
      WITH ed AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS sk
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_quantity <= 2),
      cdeg AS (SELECT c, count(*) AS dc FROM ed GROUP BY c),
      sdeg AS (SELECT sk, count(*) AS ds FROM ed GROUP BY sk),
      pairs AS (
        SELECT e1.c AS a, e2.c AS b, count(*) AS cn,
               CAST(sum(1000000 // s.ds) AS BIGINT) AS ra_scaled
        FROM ed e1 JOIN ed e2 ON e1.sk = e2.sk AND e1.c < e2.c
             JOIN sdeg s ON e1.sk = s.sk
        GROUP BY e1.c, e2.c HAVING count(*) >= 2)
      SELECT p.a, p.b, p.cn, da.dc AS da, db.dc AS db,
             (p.cn * 1000000) // (da.dc + db.dc - p.cn) AS jaccard_scaled,
             p.ra_scaled
      FROM pairs p JOIN cdeg da ON p.a = da.c JOIN cdeg db ON p.b = db.c"""

  def all: Seq[Q] = Seq(
    Q("gr_pagerank", pagerank, Some(PAGERANK_SQL)),
    Q("gr_ppr", ppr, Some(PPR_SQL)),
    Q("gr_walks", randomWalks, Some(WALKS_SQL)),
    Q("gr_linkpred", linkpred, Some(LINKPRED_SQL)),
    Q("gr_labelprop", labelProp, Some(LABELPROP_SQL)),
    Q("gr_modularity", modularity, Some(MODULARITY_SQL)),
    Q("gr_assortativity", assortativity, Some(ASSORT_SQL)),
    Q("gr_hits", hits, Some(HITS_SQL)),
    Q("gr_kcore", kcore, Some(KCORE_SQL)),
    Q("gr_bfs", bfs, Some(BFS_SQL)),
    Q("tx_mix_weights", mixWeights, Some(MIX_WEIGHTS_SQL)),
    Q("tx_mix_apply", mixApply, Some(MIX_APPLY_SQL)))
}
