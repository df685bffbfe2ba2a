package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q.tbl

/** Data-governance operators a production lakehouse runs beside every
  * ingest: Deequ-style single-pass column profiling, rule-based
  * expectation checks, a CDC snapshot diff (the change feed between two
  * materialized states), and wide-to-long unpivot.
  *
  * Scale shapes: the profile and the checks are each ONE scan — profiling
  * folds every per-column metric into a single aggregate (Spark plans the
  * multi-column exact distincts via one Expand, so the pass count stays 1
  * no matter how many columns are profiled), and the checks are
  * conditional sums inside one aggregate plus one exact-distinct. The
  * snapshot diff is two bounded-window aggregates and a user-keyed full
  * outer join — at 100 TB each side is a partial-agg-reduced state table,
  * orders of magnitude smaller than the raw event log it derives from.
  */
object GovernOps {

  /** Day boundaries inside the events month (UTC epoch seconds), shared
    * with the oracles: the "old" snapshot is day 5, the "new" is day 25 —
    * two daily activity snapshots far enough apart that all four change
    * kinds occur.
    */
  private val OldLo = 1704499200L
  private val OldHi = 1704585600L
  private val NewLo = 1706227200L
  private val NewHi = 1706313600L

  /** Latest event state within an epoch-second window: one hash aggregate;
    * the per-user "last writer" is a lexicographic max over
    * (ts, event_id, event_type) structs INSIDE the aggregate — no window
    * over the raw log, and event_id breaks timestamp ties so the state is
    * deterministic in both engines.
    */
  private def snapshot(s: SparkSession, d: String, lo: Long, hi: Long): DataFrame =
    tbl(s, d, "events")
      .select(col("user_id"), Q.tsMicros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .filter(col("us") >= lo * 1000000L && col("us") < hi * 1000000L)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        max(struct(col("us"), col("event_id"), col("event_type"))).as("m"))
      .select(col("user_id"), col("n"), col("m.event_type").as("st"))

  private def snapshotSql(alias: String, lo: Long, hi: Long): String = s"""
      $alias AS (
        SELECT user_id, count(*) AS n,
               (list(event_type ORDER BY ts DESC, event_id DESC))[1] AS st
        FROM events
        WHERE epoch(ts) >= $lo AND epoch(ts) < $hi
        GROUP BY user_id)"""

  /** Benford expectations log10(1+1/d), d=1..9, as exponent-form double
    * literals (17 significant digits → parse-exact in both engines) in a
    * shared CASE text; and the per-digit chi-square term over them.
    */
  private val BENFORD_P: String =
    "(CASE d1 " + (1 to 9).map { dd =>
      f"WHEN $dd THEN ${math.log10(1.0 + 1.0 / dd)}%.17e "
    }.mkString + "END)"

  private val CHI_TERM: String =
    s"(n_d - nt * $BENFORD_P) * (n_d - nt * $BENFORD_P) / (nt * $BENFORD_P)"

  /** The CDC change feed between the two snapshots — q29's body, shared
    * with q36_cdc_apply (which proves the feed is faithful by replaying
    * it).
    */
  private def changeFeed(s: SparkSession, d: String): DataFrame = {
    val o = snapshot(s, d, OldLo, OldHi).as("o")
    val n = snapshot(s, d, NewLo, NewHi).as("n")
    o.join(n, col("o.user_id") === col("n.user_id"), "full_outer")
      .select(
        coalesce(col("o.user_id"), col("n.user_id")).as("user_id"),
        when(col("o.user_id").isNull, "insert")
          .when(col("n.user_id").isNull, "delete")
          .when(col("o.st") === col("n.st"), "noop")
          .otherwise("update").as("change"),
        col("o.st").as("old_state"), col("n.st").as("new_state"),
        coalesce(col("o.n"), lit(0L)).as("old_n"),
        coalesce(col("n.n"), lit(0L)).as("new_n"))
  }

  def all: Seq[Q] = Seq(

    // Single-pass column profile over lineitem — the metrics a data
    // catalog publishes per column (row count, null count, exact distinct
    // count, min, max), computed for five columns of three different
    // types in ONE aggregate. Spark plans the five exact count-distincts
    // as one Expand over the scan (5x the rows into a partial aggregate,
    // still a single pass over the table — the profile never rescans);
    // min/max render through explicit string casts and the timestamp
    // through epoch micros so both engines emit identical text. At
    // 100 TB this is exactly one table scan regardless of column count.
    Q("dq_profile", (s, d) => {
      val li = tbl(s, d, "lineitem")
      def prof(c: String, v: org.apache.spark.sql.Column) = struct(
        lit(c).as("col_name"),
        coalesce(sum(when(v.isNull, 1L).otherwise(0L)), lit(0L)).as("n_null"),
        count_distinct(v).as("n_distinct"),
        min(v).cast("string").as("min_s"),
        max(v).cast("string").as("max_s"))
      li.agg(
        count(lit(1)).as("n_rows"),
        prof("l_orderkey", col("l_orderkey")).as("p1"),
        prof("l_linenumber", col("l_linenumber")).as("p2"),
        prof("l_returnflag", col("l_returnflag")).as("p3"),
        prof("l_linestatus", col("l_linestatus")).as("p4"),
        prof("l_shipdate", Q.tsMicros(col("l_shipdate"))).as("p5"))
        .select(col("n_rows"), explode(array(col("p1"), col("p2"),
          col("p3"), col("p4"), col("p5"))).as("p"))
        .select(col("p.col_name"), col("n_rows"), col("p.n_null"),
          col("p.n_distinct"), col("p.min_s"), col("p.max_s"))
    }, Some("""
      -- global aggregates (scalar-subquery n_rows), not GROUP BY n_rows:
      -- identical on any non-empty table, and an EMPTY table still yields
      -- one profile row per column (count 0, NULL extrema) like the engine
      WITH n AS (SELECT count(*) AS n_rows FROM lineitem)
      SELECT 'l_orderkey' AS col_name, (SELECT n_rows FROM n) AS n_rows,
             count(*) FILTER (l_orderkey IS NULL) AS n_null,
             count(DISTINCT l_orderkey) AS n_distinct,
             CAST(min(l_orderkey) AS VARCHAR) AS min_s,
             CAST(max(l_orderkey) AS VARCHAR) AS max_s
      FROM lineitem
      UNION ALL
      SELECT 'l_linenumber', (SELECT n_rows FROM n),
             count(*) FILTER (l_linenumber IS NULL),
             count(DISTINCT l_linenumber),
             CAST(min(l_linenumber) AS VARCHAR),
             CAST(max(l_linenumber) AS VARCHAR)
      FROM lineitem
      UNION ALL
      SELECT 'l_returnflag', (SELECT n_rows FROM n),
             count(*) FILTER (l_returnflag IS NULL),
             count(DISTINCT l_returnflag),
             min(l_returnflag), max(l_returnflag)
      FROM lineitem
      UNION ALL
      SELECT 'l_linestatus', (SELECT n_rows FROM n),
             count(*) FILTER (l_linestatus IS NULL),
             count(DISTINCT l_linestatus),
             min(l_linestatus), max(l_linestatus)
      FROM lineitem
      UNION ALL
      SELECT 'l_shipdate', (SELECT n_rows FROM n),
             count(*) FILTER (l_shipdate IS NULL),
             count(DISTINCT l_shipdate),
             CAST(min(epoch_us(l_shipdate)) AS VARCHAR),
             CAST(max(epoch_us(l_shipdate)) AS VARCHAR)
      FROM lineitem""")),

    // Expectation suite over events — the contract an ingest job asserts
    // before publishing a partition (Deequ/Great-Expectations shape):
    // each rule reports its violation count and verdict. Four of the five
    // rules are conditional sums inside ONE aggregate (a single scan);
    // the uniqueness rule needs a distinct and rides the same scan via a
    // second branch. Thresholds compare as integer cross-products — no
    // ratio materializes. At 100 TB: one pass plus one partial-agg
    // distinct, both shuffle a single row per rule to the driver sink.
    Q("dq_check", (s, d) => {
      val ev = tbl(s, d, "events")
      val base = ev.agg(
        count(lit(1)).as("n"),
        coalesce(sum(when(col("event_id").isNull, 1L).otherwise(0L)), lit(0L))
          .as("v_id_null"),
        coalesce(sum(when(!col("event_type").isin("click", "view", "purchase",
          "signup", "logout"), 1L).otherwise(0L)), lit(0L)).as("v_type_domain"),
        coalesce(sum(when(col("value") < 0.0, 1L).otherwise(0L)), lit(0L))
          .as("v_value_neg"),
        coalesce(sum(when(Q.tsMicros(col("ts")) < 1704067200000000L ||
          Q.tsMicros(col("ts")) >= 1706745600000000L, 1L).otherwise(0L)),
          lit(0L)).as("v_ts_range"))
      val uniq = ev.agg(
        (count(lit(1)) - count_distinct(col("event_id"))).as("v_id_dup"),
        count(lit(1)).as("n2"))
      base.crossJoin(broadcast(uniq))
        .select(col("n"), explode(array(
          struct(lit("event_id_not_null").as("rule"),
            col("v_id_null").as("violations")),
          struct(lit("event_id_unique").as("rule"),
            col("v_id_dup").as("violations")),
          struct(lit("event_type_in_domain").as("rule"),
            col("v_type_domain").as("violations")),
          struct(lit("value_non_negative").as("rule"),
            col("v_value_neg").as("violations")),
          struct(lit("ts_in_month").as("rule"),
            col("v_ts_range").as("violations")))).as("r"))
        .select(col("r.rule"), col("n"), col("r.violations"),
          (col("r.violations") * 1000L <= col("n")).as("pass"))
    }, Some("""
      WITH m AS (
        SELECT count(*) AS n,
               count(*) FILTER (event_id IS NULL) AS v_id_null,
               count(*) - count(DISTINCT event_id) AS v_id_dup,
               count(*) FILTER (event_type NOT IN
                 ('click','view','purchase','signup','logout')) AS v_type_domain,
               count(*) FILTER (value < 0.0) AS v_value_neg,
               count(*) FILTER (epoch_us(ts) < 1704067200000000
                 OR epoch_us(ts) >= 1706745600000000) AS v_ts_range
        FROM events)
      SELECT r.rule, m.n, r.violations, r.violations * 1000 <= m.n AS pass
      FROM m, LATERAL (
        SELECT * FROM (VALUES
          ('event_id_not_null', m.v_id_null),
          ('event_id_unique', m.v_id_dup),
          ('event_type_in_domain', m.v_type_domain),
          ('value_non_negative', m.v_value_neg),
          ('ts_in_month', m.v_ts_range)) AS t(rule, violations)) r""")),

    // CDC snapshot diff — the change feed between two materialized
    // per-user activity states (day 5 vs day 25): a full outer join on
    // the entity key classifies every row as insert / delete / update /
    // noop, carrying both images (the before/after a downstream MERGE
    // consumes). The state tables are aggregate-reduced BEFORE the join,
    // so at 100 TB the join is entity-sized, not event-sized, and the
    // last-writer state needs no window over the raw log.
    Q("q29_snapshot_diff", (s, d) => changeFeed(s, d), Some(s"""
      WITH ${snapshotSql("o", OldLo, OldHi)},
      ${snapshotSql("nw", NewLo, NewHi)}
      SELECT coalesce(o.user_id, nw.user_id) AS user_id,
             CASE WHEN o.user_id IS NULL THEN 'insert'
                  WHEN nw.user_id IS NULL THEN 'delete'
                  WHEN o.st = nw.st THEN 'noop'
                  ELSE 'update' END AS change,
             o.st AS old_state, nw.st AS new_state,
             coalesce(o.n, 0) AS old_n, coalesce(nw.n, 0) AS new_n
      FROM o FULL OUTER JOIN nw ON o.user_id = nw.user_id""")),

    // k-anonymity audit — the privacy gate a release pipeline runs before
    // publishing: group the quasi-identifier tuple (here event_type x
    // user-id decade x day) and report every equivalence class smaller
    // than k=5 — the rows a k-anonymous release must suppress or
    // generalize. One hash aggregate + HAVING; at 100 TB the class table
    // is the shuffle, bounded by the quasi-identifier domain, and the
    // suppression set is what feeds the redaction join downstream.
    Q("dq_kanon", (s, d) => {
      tbl(s, d, "events")
        .groupBy(col("event_type"),
          expr("user_id div 10").as("uid_decade"),
          Q.tsBucket(col("ts"), 86400000000L).as("day"))
        .agg(count(lit(1)).as("class_size"))
        .filter(col("class_size") < 5)
    }, Some("""
      SELECT event_type, user_id // 10 AS uid_decade,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             count(*) AS class_size
      FROM events GROUP BY 1, 2, 3 HAVING count(*) < 5""")),

    // Incremental view maintenance — the append-only MERGE an aggregate
    // materialized view takes instead of a rescan: the stored view (the
    // pre-cutoff aggregate, staged to parquet as a real stored table) is
    // combined with the DELTA batch's aggregate through the aggregates'
    // own merge functions (n, sum add; min, max combine) — count/sum/
    // min/max are self-maintainable under inserts, so the base rows are
    // NEVER rescanned. The oracle aggregates the full log in one pass;
    // the hash match proves merge(view, delta) == recompute(all). At
    // 100 TB the delta is a day's partition and the view update touches
    // view-sized data only.
    Q("q32_ivm_merge", (s, d) => {
      val cut = 1706140800000000L // day 24 of the month
      def agg(df: DataFrame) = df
        .select(Q.tsBucket(col("ts"), 300000000L).as("bucket"),
          col("event_type"),
          expr("CAST(round(value * 1000000) AS BIGINT)").as("qv"))
        .groupBy("bucket", "event_type")
        .agg(count(lit(1)).as("n"), sum("qv").as("sum_qv"),
          min("qv").as("min_qv"), max("qv").as("max_qv"))
      val viewDir = graft.TempDirs.create("graft_ivm") + "/view"
      val ev = tbl(s, d, "events")
      agg(ev.filter(Q.tsMicros(col("ts")) < cut))
        .write.mode("overwrite").parquet(viewDir)
      // the delta is everything NOT in the view — including rows with no
      // timestamp (a bare >= would drop them from both sides of the merge)
      val delta = agg(ev.filter(Q.tsMicros(col("ts")) >= cut ||
        col("ts").isNull))
      s.read.parquet(viewDir).unionByName(delta)
        .groupBy("bucket", "event_type")
        .agg(sum("n").as("n"), sum("sum_qv").as("sum_qv"),
          min("min_qv").as("min_qv"), max("max_qv").as("max_qv"))
    }, Some("""
      SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) AS bucket, event_type,
             count(*) AS n,
             CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_qv,
             min(CAST(round(value * 1000000) AS BIGINT)) AS min_qv,
             max(CAST(round(value * 1000000) AS BIGINT)) AS max_qv
      FROM events GROUP BY 1, 2""")),

    // Distribution drift monitor — the check a feature pipeline runs
    // between a reference window and a live window: value distributions
    // (first vs second half-month) bucketed into the same log-spaced bins
    // as sk_ddsketch, compared per bin by the EXACT cross-product
    // residual n_a*tot_b - n_b*tot_a (the chi-square numerator's signed
    // core, kept in int64 — a float PSI would be summation-order
    // dependent and unhashable). Full outer join on the bin keeps bins
    // that exist on only one side — precisely the drift signal. One scan,
    // two hash aggregates, a bin-keyed join.
    Q("dq_drift", (s, d) => {
      val mid = 1705363200000000L
      val bins = tbl(s, d, "events")
        .select((Q.tsMicros(col("ts")) >= mid).as("late"),
          col("event_type"),
          expr("CAST(round(value * 1000000) AS BIGINT)").as("qv"))
        .selectExpr("late", "event_type",
          "(length(bin(qv)) - 1) * 4 + " +
            "(shiftright(qv, CAST(length(bin(qv)) - 3 AS INT)) & 3) AS bid")
        .groupBy("late", "event_type", "bid").agg(count(lit(1)).as("n"))
      val a = bins.filter(!col("late")).select(col("event_type"),
        col("bid"), col("n").as("n_a"))
      val b = bins.filter(col("late")).select(col("event_type"),
        col("bid"), col("n").as("n_b"))
      val tot = bins.groupBy("event_type")
        .agg(sum(when(!col("late"), col("n")).otherwise(0L)).as("tot_a"),
          sum(when(col("late"), col("n")).otherwise(0L)).as("tot_b"))
      a.join(b, Seq("event_type", "bid"), "full_outer")
        .na.fill(0L, Seq("n_a", "n_b"))
        .join(broadcast(tot), "event_type")
        .select(col("event_type"), col("bid"), col("n_a"), col("n_b"),
          (col("n_a") * col("tot_b") - col("n_b") * col("tot_a"))
            .as("drift"))
    }, Some("""
      WITH q AS (
        SELECT epoch_us(ts) >= 1705363200000000 AS late, event_type,
               CAST(round(value * 1000000) AS BIGINT) AS qv
        FROM events),
      bins AS (
        SELECT late, event_type,
               (len(printf('%b', qv)) - 1) * 4 +
               ((qv >> (len(printf('%b', qv)) - 3)) & 3) AS bid,
               count(*) AS n
        FROM q GROUP BY 1, 2, 3),
      a AS (SELECT event_type, bid, n AS n_a FROM bins WHERE NOT late),
      b AS (SELECT event_type, bid, n AS n_b FROM bins WHERE late),
      tot AS (
        SELECT event_type,
               CAST(sum(CASE WHEN NOT late THEN n ELSE 0 END) AS BIGINT)
                 AS tot_a,
               CAST(sum(CASE WHEN late THEN n ELSE 0 END) AS BIGINT)
                 AS tot_b
        FROM bins GROUP BY 1)
      SELECT coalesce(a.event_type, b.event_type) AS event_type,
             coalesce(a.bid, b.bid) AS bid,
             CAST(coalesce(a.n_a, 0) AS BIGINT) AS n_a,
             CAST(coalesce(b.n_b, 0) AS BIGINT) AS n_b,
             CAST(coalesce(a.n_a, 0) * t.tot_b
                  - coalesce(b.n_b, 0) * t.tot_a AS BIGINT) AS drift
      FROM a FULL OUTER JOIN b
        ON a.event_type = b.event_type AND a.bid = b.bid
      JOIN tot t ON t.event_type = coalesce(a.event_type, b.event_type)""")),

    // Wide-to-long unpivot (melt) of the four lineitem measures — the
    // reshape feeding any per-metric pipeline (metric stores, feature
    // tables). One generator per row, no shuffle, values pass through
    // untouched (never aggregated, so the doubles hash identically).
    // The stratum keeps the gate output bounded; the operator itself is
    // scan-shaped at any scale.
    Q("q30_unpivot", (s, d) => {
      tbl(s, d, "lineitem")
        .filter(col("l_orderkey") % 7 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("""stack(4,
            'quantity', l_quantity,
            'extendedprice', l_extendedprice,
            'discount', l_discount,
            'tax', l_tax)""").as(Seq("measure", "val")))
    }, Some("""
      SELECT l_orderkey, l_linenumber, measure, val FROM (
        SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
               l_quantity AS val FROM lineitem
        UNION ALL SELECT l_orderkey, l_linenumber, 'extendedprice',
               l_extendedprice FROM lineitem
        UNION ALL SELECT l_orderkey, l_linenumber, 'discount',
               l_discount FROM lineitem
        UNION ALL SELECT l_orderkey, l_linenumber, 'tax',
               l_tax FROM lineitem)
      WHERE l_orderkey % 7 = 0""")),

    // Data-freshness gap audit — the "data downtime" report an ingestion
    // SLA monitor emits: per event type, the hourly buckets inside the
    // feed's own [min, max] span with NO rows, collapsed gaps-and-islands
    // style into contiguous outage windows (start, end, length). Expected
    // buckets are generated from the per-type bounds (a handful of rows),
    // present buckets come from one distinct pass; the anti-join and the
    // island window both run on bucket-sized relations, never the raw
    // log. Pure int64.
    Q("dq_gaps", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val present = tbl(s, d, "events")
        .select(col("event_type"), Q.tsBucket(col("ts"), 3600000000L).as("b"))
        .distinct()
        .persist() // bounds derive from it; one log scan total
      val expected = present.groupBy("event_type")
        .agg(min("b").as("lo"), max("b").as("hi"))
        .select(col("event_type"), explode(expr("sequence(lo, hi)")).as("b"))
      val missing = expected.join(present, Seq("event_type", "b"), "left_anti")
      val w = Window.partitionBy("event_type").orderBy("b")
      missing
        .withColumn("isl", col("b") - row_number().over(w))
        .groupBy(col("event_type"), col("isl"))
        .agg(min("b").as("gap_start"), max("b").as("gap_end"),
          count(lit(1)).as("gap_len"))
        .drop("isl")
        .select("event_type", "gap_start", "gap_end", "gap_len")
    }, Some("""
      WITH present AS (
        SELECT DISTINCT event_type,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS b
        FROM events),
      bounds AS (
        SELECT event_type, min(b) AS lo, max(b) AS hi
        FROM present GROUP BY 1),
      expected AS (
        SELECT event_type, unnest(range(lo, hi + 1)) AS b FROM bounds),
      missing AS (
        SELECT e.event_type, e.b FROM expected e
        LEFT JOIN present p ON e.event_type = p.event_type AND e.b = p.b
        WHERE p.b IS NULL),
      isl AS (
        SELECT event_type, b,
               b - row_number() OVER (PARTITION BY event_type
                                      ORDER BY b) AS isl
        FROM missing)
      SELECT event_type, min(b) AS gap_start, max(b) AS gap_end,
             count(*) AS gap_len
      FROM isl GROUP BY event_type, isl""")),

    // Referential-integrity audit — the FK checks a lakehouse runs between
    // fact and dimension loads, both verdict branches exercised: the
    // lineitem→orders edge is intact (the audit must prove a zero), while
    // orders→customer is checked against a deliberately INCOMPLETE dim
    // snapshot (every 10th key missing — the late-arriving-dimension
    // failure a real pipeline hits), so orphan counts and shares are
    // nonzero. Each audit is one distinct-collapse of the child's key and
    // one left-anti join on it — the child table's full rows never
    // shuffle; at 100 TB the anti-join carries only the distinct key set,
    // and AQE picks broadcast when the dim side fits.
    Q("dq_referential", (s, d) => {
      def audit(fk: String, child: DataFrame, ck: String,
                parent: DataFrame, pk: String): DataFrame = {
        // ONE child scan: the key collapse feeds both the key-count fold
        // and the anti-join, and shrinks the anti-join's probe side from
        // child-rows to distinct-keys before any join shuffle. child_keys
        // counts DISTINCT keys (kc rows), the same unit as orphan_keys, so
        // orphan_share is a share of the key space — not the former
        // rows-over-keys unit mix
        val kc = child.groupBy(col(ck).as("k"))
          .agg(count(lit(1)).as("cnt"))
        val rows = kc.groupBy().agg(count(lit(1)).as("child_keys"))
        val orphans = kc
          .join(parent.select(col(pk).as("k")), Seq("k"), "left_anti")
          .groupBy().agg(count(lit(1)).as("orphan_keys"),
            coalesce(min("k"), lit(-1L)).as("first_orphan"))
        graft.Caching.releaseAfterAction(
          rows.crossJoin(broadcast(orphans))
            .select(lit(fk).as("fk"), col("child_keys"), col("orphan_keys"),
              col("first_orphan"),
              // try_divide: a zero-row child table gives 0/0 -> NULL share
              // (DuckDB DOUBLE division parity), not an ANSI error
              expr("try_divide(orphan_keys, child_keys)").as("orphan_share")),
          kc)
      }
      val snap = tbl(s, d, "customer")
        .filter(col("c_custkey") % 10 =!= 3)
      audit("lineitem.l_orderkey->orders",
          tbl(s, d, "lineitem"), "l_orderkey",
          tbl(s, d, "orders"), "o_orderkey")
        .unionByName(audit("orders.o_custkey->customer_snapshot",
          tbl(s, d, "orders"), "o_custkey", snap, "c_custkey"))
    }, Some("""
      WITH a1 AS (
        SELECT 'lineitem.l_orderkey->orders' AS fk,
               (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS child_keys,
               count(*) AS orphan_keys,
               coalesce(min(k), -1) AS first_orphan
        FROM (SELECT DISTINCT l_orderkey AS k FROM lineitem) c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = c.k)),
      a2 AS (
        SELECT 'orders.o_custkey->customer_snapshot' AS fk,
               (SELECT count(DISTINCT o_custkey) FROM orders) AS child_keys,
               count(*) AS orphan_keys,
               coalesce(min(k), -1) AS first_orphan
        FROM (SELECT DISTINCT o_custkey AS k FROM orders) c
        WHERE NOT EXISTS (SELECT 1 FROM customer p
                          WHERE p.c_custkey % 10 != 3 AND p.c_custkey = c.k))
      SELECT fk, child_keys, orphan_keys, first_orphan,
             orphan_keys / child_keys AS orphan_share
      FROM a1
      UNION ALL
      SELECT fk, child_keys, orphan_keys, first_orphan,
             orphan_keys / child_keys AS orphan_share
      FROM a2""")),

    // Benford first-digit audit — the fraud/fabrication screen a finance
    // or data-quality team runs on any organically-generated amount
    // column: the leading significant digit of |value| (micro-quantized,
    // string-sliced — works for any magnitude, sign-safe via abs) counted
    // per digit and compared against Benford's log10(1+1/d) expectation.
    // The expectations ride as 17-significant-digit DOUBLE literals in
    // EXPONENT form (a `0.301…` literal would parse as DECIMAL in Spark
    // and shift the arithmetic off DuckDB's double path — the gr_modularity
    // lesson), generated once and spliced into both engines; the per-digit
    // chi-square term is then a shared-text straight-line double over the
    // exact counts. One scan, one 9-row aggregate, one broadcast fold.
    Q("dq_benford", (s, d) => {
      val digits = tbl(s, d, "events")
        .select(expr(
          """CAST(substr(CAST(abs(CAST(round(value * 1000000) AS BIGINT))
               AS STRING), 1, 1) AS BIGINT)""").as("d1"))
        .filter(col("d1") >= 1)
        .groupBy("d1").agg(count(lit(1)).as("n_d"))
      val tot = digits.groupBy().agg(sum("n_d").as("nt"))
      digits.crossJoin(broadcast(tot))
        .withColumn("benford_p", expr(BENFORD_P))
        .withColumn("share", expr("n_d / nt"))
        .withColumn("chi_term", expr(CHI_TERM))
    }, Some(s"""
      WITH dg AS (
        SELECT CAST(substr(CAST(abs(CAST(round(value * 1000000) AS BIGINT))
                 AS VARCHAR), 1, 1) AS BIGINT) AS d1
        FROM events),
      c AS (SELECT d1, count(*) AS n_d FROM dg WHERE d1 >= 1 GROUP BY 1),
      t AS (SELECT CAST(sum(n_d) AS BIGINT) AS nt FROM c)
      SELECT d1, n_d, nt, $BENFORD_P AS benford_p, n_d / nt AS share,
             $CHI_TERM AS chi_term
      FROM c CROSS JOIN t""")),

    // CDC apply — the closure property that proves the q29 change feed is
    // FAITHFUL: compact the feed to a true delta (rows where the state OR
    // the count actually changed — q29's 'noop' kind only pins the state
    // column, so count-only drifts stay in the delta), then replay it
    // against the OLD snapshot the way a MERGE sink would: untouched rows
    // pass through an anti-join on the delta keys, deleted keys vanish,
    // insert/update keys take their after-images. The gate's oracle is
    // the NEW snapshot built directly — hash equality IS the proof that
    // feed + apply loses and invents nothing. At 100 TB both sides of
    // every join are aggregate-reduced state tables (user-sized), and the
    // anti-join/union pair is exactly the shape of an incremental MERGE
    // into a materialized dimension.
    Q("q36_cdc_apply", (s, d) => {
      // two references (anti-join keys + after-images); releaseAfterAction
      // persists it and drops the cache once the gate action completes
      val delta = changeFeed(s, d)
        .filter(col("change") =!= "noop" || col("old_n") =!= col("new_n"))
      val applied = snapshot(s, d, OldLo, OldHi)
        .join(delta.select("user_id"), Seq("user_id"), "left_anti")
        .unionByName(delta.filter(col("change") =!= "delete")
          .select(col("user_id"), col("new_n").as("n"),
            col("new_state").as("st")))
      graft.Caching.releaseAfterAction(applied, delta)
    }, Some(s"""
      WITH ${snapshotSql("nw", NewLo, NewHi)}
      SELECT user_id, n, st FROM nw""")),

    // Robust outlier screen — median/MAD, the estimator that survives the
    // contamination it is hunting (a mean/stddev z-score moves with every
    // outlier it should flag; the 50% breakdown point of the median does
    // not). Per event_type over exact value micros: med, the median
    // absolute deviation, and the count beyond the classic
    // 3σ-equivalent fence 3·1.4826·MAD. Float discipline: micros stay
    // BIGINT until ONE median interpolation (both engines compute
    // lo + (hi-lo)·0.5 in DOUBLE) and ONE fence multiply — no
    // order-dependent double sums anywhere. Scale shape: group-keyed
    // aggregates plus BROADCAST joins of the group-sized med/mad
    // relations back onto the stream — never a data-sized window; the
    // NULL event_type group is kept through null-safe join keys. Honest
    // cost note: EXACT medians mean the Percentile aggregation buffers
    // carry per-group value lists through the shuffle (the price of
    // matching the oracle bit-for-bit); the 100 TB screen swaps in
    // approx_percentile / the DDSketch aggregate (sk_ddsketch) with the
    // identical plan shape and sketch-sized buffers.
    Q("dq_outliers", (s, d) => {
      val vm = tbl(s, d, "events")
        .select(col("event_type"),
          expr("CAST(round(value * 1000000) AS BIGINT)").as("vm"))
      val med = vm.groupBy("event_type")
        .agg(expr("median(vm)").as("med"))
      val dev = vm.as("v")
        .join(broadcast(med.as("m")),
          col("v.event_type") <=> col("m.event_type"))
        .select(col("v.event_type").as("event_type"), col("vm"),
          col("med"), abs(col("vm") - col("med")).as("adev"))
      val mad = dev.groupBy("event_type")
        .agg(expr("median(adev)").as("mad"))
      dev.as("d")
        .join(broadcast(mad.as("a")),
          col("d.event_type") <=> col("a.event_type"))
        .groupBy(col("d.event_type").as("event_type"))
        .agg(count(lit(1)).as("n"), min("med").as("med"),
          min("mad").as("mad"),
          sum(when(col("adev") > lit(4.4478d) * col("mad"), 1L)
            .otherwise(0L)).as("n_out"))
    }, Some("""
      WITH vm AS (
        SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS vm
        FROM events),
      med AS (SELECT event_type, median(vm) AS med FROM vm GROUP BY 1),
      dev AS (
        SELECT v.event_type, v.vm, m.med, abs(v.vm - m.med) AS adev
        FROM vm v JOIN med m
          ON v.event_type IS NOT DISTINCT FROM m.event_type),
      mad AS (SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1)
      SELECT d.event_type, count(*) AS n, min(d.med) AS med,
             min(a.mad) AS mad,
             CAST(sum(CASE WHEN d.adev > 4.4478 * a.mad THEN 1 ELSE 0 END)
               AS BIGINT) AS n_out
      FROM dev d JOIN mad a
        ON d.event_type IS NOT DISTINCT FROM a.event_type
      GROUP BY 1""")))
}
