package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Q.tbl

/** Relational core: scans, filters, joins, aggregations, windows, sorts,
  * set ops, scalar functions, grouping sets, time bucketing, JSON — the
  * category checklist of SURVEY.md §2.2 exercised over the harness tables.
  *
  * Plans are written Catalyst-first: filters/projections sit directly on the
  * parquet scans (pushdown), dimension joins are explicitly broadcast, and
  * aggregates use built-in functions only (whole-stage codegen; no UDFs).
  */
object CoreQueries {

  private val dec = "decimal(18,2)"

  def all: Seq[Q] = Seq(
    // -- aggregation over a full scan (TPC-H Q1 shape) -----------------------
    Q("q1_agg", (s, d) => {
      tbl(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          // sums are exact decimal internally; the FINAL cast to DOUBLE makes
          // both engines round the same exact value to the same float64 —
          // DECIMAL outputs render differently across the driver's read paths
          // (DuckDB pandas → float64, parquet/pyarrow → Decimal objects)
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base"),
          sum(col("l_extendedprice").cast(dec) *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
            .cast("double").as("sum_disc"),
          count(lit(1)).as("cnt"))
    }, Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc,
             count(*) AS cnt
      FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    // -- selective filter + aggregate (TPC-H Q6 shape; predicate pushdown) ---
    Q("q6_filter", (s, d) => {
      tbl(s, d, "lineitem")
        .filter(col("l_discount").between(0.03, 0.07) && col("l_quantity") < 25)
        .agg(sum(col("l_extendedprice").cast(dec) *
            col("l_discount").cast("decimal(4,2)"))
          .cast("double").as("revenue"), count(lit(1)).as("cnt"))
    }, Some("""
      SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
             count(*) AS cnt
      FROM lineitem
      WHERE l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 25""")),

    // -- fact-fact join + aggregate ------------------------------------------
    Q("q2_join_agg", (s, d) => {
      val o = tbl(s, d, "orders").filter(col("o_orderdate") >= lit("1996-01-01"))
      val l = tbl(s, d, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .filter(l("l_shipdate") > o("o_orderdate"))
        .groupBy("o_orderpriority")
        .agg(countDistinct("o_orderkey").as("n_orders"),
          sum(col("l_extendedprice").cast(dec) *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
            .cast("double").as("revenue"))
    }, Some("""
      SELECT o_orderpriority, count(DISTINCT o_orderkey) AS n_orders,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderdate >= '1996-01-01' AND l_shipdate > o_orderdate
      GROUP BY o_orderpriority""")),

    // -- broadcast dimension join chain --------------------------------------
    Q("q3_dim_join", (s, d) => {
      val c = tbl(s, d, "customer")
      val n = tbl(s, d, "nation")
      val r = tbl(s, d, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c_acctbal").cast(dec)).cast("double").as("sum_bal"))
    }, Some("""
      SELECT r_name, count(*) AS n_cust,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name""")),

    // -- semi join (EXISTS) ---------------------------------------------------
    Q("q4_semijoin", (s, d) => {
      val o = tbl(s, d, "orders")
      val big = tbl(s, d, "lineitem").filter(col("l_quantity") > 49)
        .select(col("l_orderkey"))
      o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    }, Some("""
      SELECT o_orderstatus, count(*) AS n FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 49)
      GROUP BY o_orderstatus""")),

    // -- anti join (NOT EXISTS) ----------------------------------------------
    Q("q5_antijoin", (s, d) => {
      val c = tbl(s, d, "customer")
      val o = tbl(s, d, "orders").select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    }, Some("""
      SELECT c_mktsegment, count(*) AS n FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY c_mktsegment""")),

    // -- top-k per group (window + filter) -----------------------------------
    Q("q7_topk", (s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      tbl(s, d, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("c_mktsegment", "rn", "c_custkey", "c_acctbal")
    }, Some("""
      SELECT c_mktsegment, rn, c_custkey, c_acctbal FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        FROM customer) WHERE rn <= 3""")),

    // -- running aggregate (the O10 dense-rank family's windowed cousin) -----
    Q("q8_running", (s, d) => {
      // NULLS LAST pinned: an unshipped line (NULL date) accumulates at the
      // end of its supplier's running total in BOTH engines (Spark's ASC
      // default is nulls-first, DuckDB's is nulls-last)
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate").asc_nulls_last, col("l_orderkey").asc,
          col("l_linenumber").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tbl(s, d, "lineitem")
        .filter(col("l_suppkey") % 10 === 0)
        .withColumn("running_qty",
          sum(col("l_quantity").cast(dec)).over(w).cast("double"))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
    }, Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
               OVER (PARTITION BY l_suppkey
                     ORDER BY l_shipdate ASC NULLS LAST, l_orderkey ASC, l_linenumber ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      FROM lineitem WHERE l_suppkey % 10 = 0""")),

    // -- exact distinct aggregation ------------------------------------------
    Q("q9_distinct", (s, d) => {
      tbl(s, d, "lineitem")
        .groupBy("l_suppkey")
        .agg(countDistinct("l_partkey").as("n_parts"),
          countDistinct("l_orderkey").as("n_orders"))
        .filter(col("n_parts") > 1)
    }, Some("""
      SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_orderkey) AS n_orders
      FROM lineitem GROUP BY l_suppkey HAVING count(DISTINCT l_partkey) > 1""")),

    // -- set operations -------------------------------------------------------
    Q("q10_setops", (s, d) => {
      val sold = tbl(s, d, "lineitem").select(col("l_partkey").as("pk")).distinct()
      val bigParts = tbl(s, d, "part").filter(col("p_size") > 25)
        .select(col("p_partkey").as("pk"))
      sold.except(bigParts)
    }, Some("""
      SELECT DISTINCT l_partkey AS pk FROM lineitem
      EXCEPT
      SELECT p_partkey AS pk FROM part WHERE p_size > 25""")),

    // -- scalar string functions ---------------------------------------------
    Q("q11_scalar", (s, d) => {
      tbl(s, d, "part")
        .select(col("p_partkey"),
          upper(substring(col("p_name"), 1, 8)).as("uname"),
          length(col("p_name")).as("nlen"),
          concat_ws("-", col("p_brand"), col("p_type")).as("bt"))
        .filter(col("p_partkey") % 3 === 0)
    }, Some("""
      SELECT p_partkey, upper(substr(p_name, 1, 8)) AS uname,
             length(p_name) AS nlen,
             concat_ws('-', p_brand, p_type) AS bt
      FROM part WHERE p_partkey % 3 = 0""")),

    // -- date parts -----------------------------------------------------------
    Q("q12_date", (s, d) => {
      tbl(s, d, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec)).cast("double").as("total"))
    }, Some("""
      SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
             count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY year(o_orderdate), month(o_orderdate)""")),

    // -- rollup / grouping sets ----------------------------------------------
    Q("q13_rollup", (s, d) => {
      // Dataset.rollup trips Spark's ambiguous-self-join false positive on
      // this join chain; the SQL form plans identically (broadcast hints on
      // the dimension tables, Expand + partial/final hash aggregate).
      val base = s.sql(s"""
        SELECT /*+ BROADCAST(n), BROADCAST(r) */ r_name, n_name, count(*) AS n_cust
        FROM parquet.`$d/customer.parquet` c
        JOIN parquet.`$d/nation.parquet` n ON c_nationkey = n_nationkey
        JOIN parquet.`$d/region.parquet` r ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)""")
      // SQL standard: ROLLUP's () grouping set aggregates the whole input,
      // so ZERO input rows still produce the grand-total row (DuckDB does);
      // Spark's Expand-based rollup emits nothing — restore the standard row.
      // The probe runs on the PRE-AGGREGATION join (LIMIT-1 short-circuit),
      // not on `base`: probing the rollup itself would execute the Expand +
      // full aggregation once for the probe and again on the real action.
      val inputEmpty = s.sql(s"""
        SELECT /*+ BROADCAST(n), BROADCAST(r) */ 1
        FROM parquet.`$d/customer.parquet` c
        JOIN parquet.`$d/nation.parquet` n ON c_nationkey = n_nationkey
        JOIN parquet.`$d/region.parquet` r ON n_regionkey = r_regionkey
        LIMIT 1""").isEmpty
      if (inputEmpty)
        s.sql("""SELECT CAST(NULL AS STRING) AS r_name,
                        CAST(NULL AS STRING) AS n_name,
                        CAST(0 AS BIGINT) AS n_cust""")
      else base
    }, Some("""
      SELECT r_name, n_name, count(*) AS n_cust
      FROM customer JOIN nation ON c_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)""")),

    // -- equi-width histogram --------------------------------------------------
    // The profiling primitive behind every distribution dashboard: 16
    // equal-width buckets between the observed min and max of the exact
    // value micros. Bucketing is PURE INTEGER — ((vm-mn)*16) div (mx-mn+1)
    // — so the edges cannot drift between engines the way a float
    // width_bucket would; the bounds reach the plan as a broadcast 1-row
    // aggregate (never collected literals), and NULL values form their own
    // NULL-bucket group in both engines.
    Q("q40_histogram", (s, d) => {
      val vm = tbl(s, d, "events")
        .select(expr("CAST(round(value * 1000000) AS BIGINT)").as("vm"))
      val bounds = vm.agg(min("vm").as("mn"), max("vm").as("mx"))
      vm.crossJoin(broadcast(bounds))
        .groupBy(expr("((vm - mn) * 16) div (mx - mn + 1)").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min("vm").as("v_lo"), max("vm").as("v_hi"))
    }, Some("""
      WITH vm AS (
        SELECT CAST(round(value * 1000000) AS BIGINT) AS vm FROM events),
      b AS (SELECT min(vm) AS mn, max(vm) AS mx FROM vm)
      SELECT ((vm - mn) * 16) // (mx - mn + 1) AS bucket, count(*) AS n,
             min(vm) AS v_lo, max(vm) AS v_hi
      FROM vm CROSS JOIN b GROUP BY 1""")),

    // -- top-k per group WITHOUT a window sort ---------------------------------
    // q7_topk gates the idiomatic row_number window form; this gates the
    // SCALE form: a bounded-buffer TypedImperativeAggregate (TopKPairs)
    // that keeps O(k) pairs per group and never orders the losers. Honest
    // comparison vs Spark 4's own window plan: the optimizer's partial
    // WindowGroupLimit already bounds the window form's SHUFFLE to k rows
    // per group per task, but only after a full per-partition Sort on
    // (key, value) — O(n log n) over every input row, twice (partial +
    // final). The aggregate replaces both sorts with an O(n log k) heap
    // and stays in a hash aggregate. Hash-identical to the row_number
    // oracle by construction (value DESC, id ASC rank order; NULL values
    // skipped like any SQL aggregate, so the oracle filters them
    // pre-rank).
    Q("q41_topk_agg", (s, d) => {
      tbl(s, d, "events")
        .select(col("event_type"),
          expr("CAST(round(value * 1000000) AS BIGINT)").as("vm"),
          col("event_id"))
        .groupBy("event_type")
        .agg(graft.functions.TopKPairs(col("vm"), col("event_id"), 3).as("tk"))
        .select(col("event_type"), posexplode(col("tk")))
        .select(col("event_type"), (col("pos") + 1).cast("long").as("rnk"),
          col("col.v").as("vm"), col("col.id").as("event_id"))
    }, Some("""
      SELECT event_type, rn AS rnk, vm, event_id FROM (
        SELECT event_type, vm, event_id,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY vm DESC, event_id) AS rn
        FROM (SELECT event_type,
                     CAST(round(value * 1000000) AS BIGINT) AS vm, event_id
              FROM events WHERE value IS NOT NULL) t) r
      WHERE rn <= 3""")),

    // -- event-time tumbling window (batch form; streaming twin in
    //    StreamingOps) ---------------------------------------------------------
    Q("q14_tumbling", (s, d) => {
      tbl(s, d, "events")
        .withColumn("bucket", Q.tsBucket(col("ts"), 300000000L))
        .groupBy("bucket", "event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .filter(col("n") > 1)
    }, Some("""
      SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) AS bucket, event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 HAVING count(*) > 1""")),

    // -- pivot (wide aggregation) ---------------------------------------------
    Q("q19_pivot", (s, d) => {
      tbl(s, d, "events")
        .groupBy((col("user_id") % 10).as("user_mod"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
    }, Some("""
      SELECT user_id % 10 AS user_mod,
             count(*) FILTER (WHERE event_type = 'click') AS click,
             count(*) FILTER (WHERE event_type = 'view') AS view,
             count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             count(*) FILTER (WHERE event_type = 'signup') AS signup,
             count(*) FILTER (WHERE event_type = 'error') AS error
      FROM events GROUP BY user_id % 10""")),

    // -- skew-resistant two-phase distinct aggregation ------------------------
    // event_type has 5 hot values over 100k+ rows: a naive per-key
    // countDistinct funnels each hot key through one reducer. Pre-distincting
    // on (key, value) spreads the heavy phase across the full (key, value)
    // space — the manual salting shape for distincts — then the final count
    // per key is tiny.
    Q("q18_skew_distinct", (s, d) => {
      tbl(s, d, "events")
        .select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_users"))
    }, Some("""
      SELECT event_type, count(DISTINCT user_id) AS n_users
      FROM events GROUP BY event_type""")),

    // -- outer join with null semantics --------------------------------------
    Q("q17_left_join", (s, d) => {
      val o = tbl(s, d, "orders")
      val big = tbl(s, d, "lineitem").filter(col("l_quantity") > 45)
        .groupBy("l_orderkey").agg(count(lit(1)).as("n_big"))
      o.join(big, o("o_orderkey") === big("l_orderkey"), "left")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          count(col("n_big")).as("n_with_big"),
          sum(coalesce(col("n_big"), lit(0L))).as("total_big"))
    }, Some("""
      SELECT o_orderpriority, count(*) AS n_orders,
             count(b.n_big) AS n_with_big,
             CAST(sum(coalesce(b.n_big, 0)) AS BIGINT) AS total_big
      FROM orders o LEFT JOIN (
        SELECT l_orderkey, count(*) AS n_big FROM lineitem
        WHERE l_quantity > 45 GROUP BY l_orderkey) b
        ON o.o_orderkey = b.l_orderkey
      GROUP BY o_orderpriority""")),

    // -- JSON / regexp extraction --------------------------------------------
    Q("q15_json", (s, d) => {
      tbl(s, d, "events")
        .withColumn("k",
          regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("int"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), min("k").as("min_k"), max("k").as("max_k"))
    }, Some("""
      SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) % 10 AS k_mod,
             count(*) AS n,
             min(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT)) AS min_k,
             max(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT)) AS max_k
      FROM events GROUP BY 1""")),

    // -- exact discrete quantiles per group ----------------------------------
    // p50/p95/p99 as the element at ceil(p*n) of each group's sorted values
    // (quantile_disc semantics) — pure integer selection, so both engines
    // agree bit-for-bit where continuous-interpolation quantiles carry
    // last-ulp FP noise. The window partitions per event_type: bounded
    // groups, shuffle on the group key only.
    Q("q21_quantile", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy(col("qv").asc, col("event_id").asc)
      // percentiles are over OBSERVED measurements: NULL values are
      // excluded in both engines (they would otherwise rank NULLS FIRST in
      // Spark but NULLS LAST in DuckDB and silently shift every quantile)
      val ranked = tbl(s, d, "events")
        .filter(col("value").isNotNull)
        .select(col("event_id"), col("event_type"),
          expr("CAST(round(value * 1000000) AS BIGINT)").as("qv"))
        .withColumn("rn", row_number().over(w))
        // group size via the same partition's window (the oracle's shape):
        // the former count-then-equi-join silently LOST the NULL-type
        // group (NULL keys never match an equi-join)
        .withColumn("n",
          count(lit(1)).over(Window.partitionBy("event_type")))
      ranked
        .groupBy(col("event_type"), col("n"))
        .agg(
          max(when(col("rn") === ceil(col("n") * 0.5), col("qv"))).as("p50"),
          max(when(col("rn") === ceil(col("n") * 0.95), col("qv"))).as("p95"),
          max(when(col("rn") === ceil(col("n") * 0.99), col("qv"))).as("p99"))
        .select("event_type", "n", "p50", "p95", "p99")
    }, Some("""
      WITH ranked AS (
        SELECT event_type,
               CAST(round(value * 1000000) AS BIGINT) AS qv,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY CAST(round(value * 1000000) AS BIGINT) ASC,
                                           event_id ASC) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value IS NOT NULL)
      SELECT event_type, n,
             CAST(max(CASE WHEN rn = ceil(n * 0.5) THEN qv END) AS BIGINT) AS p50,
             CAST(max(CASE WHEN rn = ceil(n * 0.95) THEN qv END) AS BIGINT) AS p95,
             CAST(max(CASE WHEN rn = ceil(n * 0.99) THEN qv END) AS BIGINT) AS p99
      FROM ranked GROUP BY event_type, n""")),

    // -- recursive CTE (hierarchy walk) --------------------------------------
    // Spark 4's WITH RECURSIVE (UnionLoop): every customer walks the
    // implicit binary hierarchy node -> node div 2 up to the root, and the
    // per-depth census (count + key sum) pins the whole closure. The
    // recursion is a bounded iterative self-union — depth = log2(max key),
    // ~21 levels at 100 TB scale — and each level is one hash aggregate's
    // worth of work on the surviving frontier, which HALVES per level; the
    // anchor scan reads one column. The same query runs verbatim in DuckDB
    // (modulo div spelling), making the oracle a true recursive twin.
    Q("q27_recursive", (s, d) => {
      s.sql(s"""
        WITH RECURSIVE walk(custkey, node, depth) AS (
          SELECT c_custkey, c_custkey, CAST(0 AS BIGINT)
          FROM parquet.`$d/customer.parquet`
          UNION ALL
          SELECT custkey, node DIV 2, depth + 1 FROM walk WHERE node > 1)
        SELECT depth, count(*) AS n, sum(custkey) AS sum_key
        FROM walk GROUP BY depth""")
    }, Some("""
      WITH RECURSIVE walk(custkey, node, depth) AS (
        SELECT c_custkey, c_custkey, CAST(0 AS BIGINT) FROM customer
        UNION ALL
        SELECT custkey, node // 2, depth + 1 FROM walk WHERE node > 1)
      SELECT depth, count(*) AS n, CAST(sum(custkey) AS BIGINT) AS sum_key
      FROM walk GROUP BY depth""")),

    // -- cohort retention ----------------------------------------------------
    // The product-analytics staple the funnel (q26) doesn't cover: users
    // cohorted by their FIRST-seen 6-hour bucket, then distinct-user
    // retention at each bucket age. Two hash aggregates and one user-keyed
    // equi-join — the first-seen aggregate leaves both sides partitioned
    // by user_id, so the join is shuffle-free on the firsts side, and no
    // window ever orders the raw event stream. Exact countDistinct: the
    // retention matrix is small (cohorts x ages), the distinct shuffle is
    // keyed by it.
    Q("q28_cohort", (s, d) => {
      val e = tbl(s, d, "events")
        .select(col("user_id"), Q.tsBucket(col("ts"), 21600000000L).as("b"))
      val f = e.groupBy("user_id").agg(min("b").as("cohort"))
      e.join(f, "user_id")
        .groupBy(col("cohort"), (col("b") - col("cohort")).as("age"))
        .agg(countDistinct("user_id").as("users"), count(lit(1)).as("n"))
    }, Some("""
      WITH e AS (
        SELECT user_id, CAST(floor(epoch(ts) / 21600) AS BIGINT) AS b
        FROM events),
      f AS (SELECT user_id, min(b) AS cohort FROM e GROUP BY user_id)
      SELECT f.cohort, e.b - f.cohort AS age,
             count(DISTINCT e.user_id) AS users, count(*) AS n
      FROM e JOIN f USING (user_id) GROUP BY 1, 2""")),

    // -- event-time RANGE window frames --------------------------------------
    // The frame kind q23's suite doesn't touch: a VALUE-based (RANGE)
    // frame — per user, the trailing-1-hour event count and value sum at
    // every event. RANGE frames bound by the ORDER-BY value (micros here),
    // not by row offsets, and include the whole peer group of the current
    // key — both engines share that peer rule, and the micros/quantized
    // sums keep everything exact int64. One user-keyed shuffle + sort; the
    // frame scan is the windowed-aggregation sliding-accumulator path, not
    // a per-row rescan.
    Q("q31_range_frame", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("us")
        .rangeBetween(-3600000000L, Window.currentRow)
      tbl(s, d, "events")
        .select(col("user_id"), col("event_id"),
          Q.tsMicros(col("ts")).as("us"),
          expr("CAST(round(value * 1000000) AS BIGINT)").as("qv"))
        .select(col("user_id"), col("event_id"), col("us"),
          count(lit(1)).over(w).as("n_1h"),
          sum("qv").over(w).as("sum_1h"))
    }, Some("""
      SELECT user_id, event_id, epoch_us(ts) AS us,
             count(*) OVER w AS n_1h,
             CAST(sum(CAST(round(value * 1000000) AS BIGINT)) OVER w
               AS BIGINT) AS sum_1h
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""")),

    // -- explicit GROUPING SETS ----------------------------------------------
    // The multi-grain aggregate q13's ROLLUP and q24's CUBE don't cover:
    // an ARBITRARY grouping-set list — here (flag, status), (flag),
    // (status) but NOT the grand total, exactly the shape a dashboard's
    // mixed drill-downs ask for. Spark plans one scan + one Expand (rows
    // replicated once per set), the same single-pass trick dq_profile
    // leans on; grouping_id disambiguates the NULL-as-aggregate rows.
    Q("q33_grouping_sets", (s, d) => {
      tbl(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
               count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus))""")
    }, Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
             CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
             count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                              (l_returnflag), (l_linestatus))""")),

    // -- multiset (bag) set operations ---------------------------------------
    // INTERSECT ALL / EXCEPT ALL — the bag semantics q10's distinct
    // EXCEPT doesn't exercise: per key, the result carries
    // min(count_a, count_b) resp. count_a - count_b DUPLICATE rows.
    // Spark plans both as a single aggregate computing per-key counts on
    // each side then re-generating rows — no distinct collapse, no join
    // explosion. The two branches are tagged and unioned into one gate so
    // the multiplicities themselves are hash-pinned.
    Q("q35_multiset_ops", (s, d) => {
      val a = tbl(s, d, "lineitem").filter(col("l_orderkey") % 2 === 0)
        .select(col("l_partkey").as("pk"))
      val b = tbl(s, d, "lineitem").filter(col("l_orderkey") % 2 === 1)
        .select(col("l_partkey").as("pk"))
      a.exceptAll(b).select(lit("except_all").as("op"), col("pk"))
        .unionByName(a.intersectAll(b)
          .select(lit("intersect_all").as("op"), col("pk")))
    }, Some("""
      WITH a AS (SELECT l_partkey AS pk FROM lineitem
                 WHERE l_orderkey % 2 = 0),
      b AS (SELECT l_partkey AS pk FROM lineitem WHERE l_orderkey % 2 = 1)
      SELECT 'except_all' AS op, pk FROM (
        SELECT pk FROM a EXCEPT ALL SELECT pk FROM b)
      UNION ALL
      SELECT 'intersect_all', pk FROM (
        SELECT pk FROM a INTERSECT ALL SELECT pk FROM b)""")),

    // -- LATERAL correlated subquery -----------------------------------------
    // Per order, its top-2 line items by extended price through a LATERAL
    // correlated subquery — the "top-N per group as a join" surface.
    // Catalyst DECORRELATES the lateral into a ranked window join rather
    // than executing per-row subqueries (plan-guarded in the spec: one
    // window, no nested-loop re-execution per outer row) — the rewrite
    // that makes lateral top-N viable over 100 TB of orders.
    Q("q34_lateral", (s, d) => {
      tbl(s, d, "orders").createOrReplaceTempView("orders")
      tbl(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT o.o_orderkey, o.o_custkey, t.l_linenumber, t.l_extendedprice
        FROM orders o
        JOIN LATERAL (
          SELECT l_linenumber, l_extendedprice
          FROM lineitem
          WHERE l_orderkey = o.o_orderkey
          ORDER BY l_extendedprice DESC, l_linenumber ASC
          LIMIT 2) t
        WHERE o.o_orderkey % 5 = 0""")
    }, Some("""
      SELECT o.o_orderkey, o.o_custkey, t.l_linenumber, t.l_extendedprice
      FROM orders o
      JOIN LATERAL (
        SELECT l_linenumber, l_extendedprice
        FROM lineitem
        WHERE l_orderkey = o.o_orderkey
        ORDER BY l_extendedprice DESC, l_linenumber ASC
        LIMIT 2) t ON true
      WHERE o.o_orderkey % 5 = 0""")),

    // -- NULL semantics, pinned ----------------------------------------------
    // The NULL edge cases every engine migration trips over, in one gate:
    // a nullable metric (value nulled on the out-of-domain 'error' type)
    // and a nullable grouping key (type nulled the same way). Pins that
    // (a) NULL forms its OWN group under GROUP BY — the gate emits a
    // NULL-keyed row, (b) count(col) skips NULLs while count(*) does not,
    // (c) count(DISTINCT col) excludes NULL, (d) sum over an all-NULL
    // slice is NULL, not 0 — the NULL-key row's sum_v is the NULL the
    // hash must carry. One aggregate, no joins; identical text modulo
    // dialect-neutral CASE.
    Q("q37_null_semantics", (s, d) => {
      tbl(s, d, "events")
        .select(
          when(col("event_type") =!= "error", col("event_type")).as("k"),
          when(col("event_type") =!= "error",
            expr("CAST(round(value * 1000000) AS BIGINT)")).as("v"),
          col("user_id"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_rows"), count(col("v")).as("n_v"),
          sum("v").as("sum_v"),
          countDistinct(col("v")).as("nd_v"),
          countDistinct(when(col("v").isNotNull, col("user_id"))).as("nd_users"))
    }, Some("""
      WITH e AS (
        SELECT CASE WHEN event_type != 'error' THEN event_type END AS k,
               CASE WHEN event_type != 'error'
                    THEN CAST(round(value * 1000000) AS BIGINT) END AS v,
               user_id
        FROM events)
      SELECT k, count(*) AS n_rows, count(v) AS n_v,
             CAST(sum(v) AS BIGINT) AS sum_v,
             count(DISTINCT v) AS nd_v,
             count(DISTINCT CASE WHEN v IS NOT NULL THEN user_id END)
               AS nd_users
      FROM e GROUP BY k""")),

    // -- running DISTINCT over a window --------------------------------------
    // Per user, the cumulative count of distinct event types at every
    // event — "how much of the product has this user touched so far".
    // Spark has no DISTINCT window aggregate; `size(collect_set(...))`
    // over the running frame is the standard exact equivalent (set state
    // is bounded by the type domain), and DuckDB's native
    // count(DISTINCT) OVER pins the semantics match. Partitions are
    // user-bounded; total order inside them is (ts, event_id).
    Q("q38_window_distinct", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // time-ordered contract: an event with no timestamp has no place on
      // the running timeline (Spark would rank it NULLS FIRST, DuckDB LAST)
      tbl(s, d, "events")
        .filter(col("ts").isNotNull)
        .select(col("user_id"), Q.tsMicros(col("ts")).as("us"),
          col("event_id"), col("event_type"))
        .withColumn("nd_types",
          size(collect_set(col("event_type")).over(w)).cast("long"))
        .select("user_id", "event_id", "nd_types")
    }, Some("""
      SELECT user_id, event_id,
             count(DISTINCT event_type)
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS nd_types
      FROM events WHERE ts IS NOT NULL""")),

    // -- parameterized SQL ---------------------------------------------------
    // Spark 3.4's named-parameter API (`spark.sql(text, args)`): the
    // injection-safe templating surface a service layer calls instead of
    // string-splicing literals — parameters bind as typed literals in the
    // parsed plan, so constant folding and pushdown see them exactly as
    // if written inline (which is what the literal-inlined oracle
    // proves). The exact-decimal-sum-to-double discipline matches q1's.
    Q("q39_parameterized", (s, d) => {
      tbl(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT l_returnflag, count(*) AS n,
                  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                    AS qty
           FROM lineitem
           WHERE l_quantity <= :qmax AND l_orderkey % :m = 0
           GROUP BY l_returnflag""",
        Map("qmax" -> 10, "m" -> 3))
    }, Some("""
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
      FROM lineitem
      WHERE l_quantity <= 10 AND l_orderkey % 3 = 0
      GROUP BY l_returnflag"""))
  )
}
