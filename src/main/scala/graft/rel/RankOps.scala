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

  def all: Seq[Q] = Seq(
    Q("gr_pagerank", pagerank, Some(PAGERANK_SQL)))
}
