package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.KMinStrings
import Q.tbl

/** KMV distinct-count sketch behind the DuckDB gate.
  *
  * `sk_kmv_users` estimates distinct users per event type from the k=8
  * smallest md5 values via the [[graft.functions.KMinStrings]]
  * TypedImperativeAggregate — ONE pass over events with map-side partial
  * aggregation and an O(k) buffer, versus the exact path's full
  * (type, user) pre-distinct shuffle (q18_skew_distinct). The k-min SET is
  * order-insensitive, so the sketch is deterministic under any partitioning
  * and DuckDB can replay it exactly: same k minima, same estimate bits.
  *
  * Double parity rule: both engines compute
  * `7.0 * 2^60 / CAST(v AS DOUBLE)` with v the first 15 md5 nibbles as an
  * exact BIGINT (Spark `conv`, DuckDB nibble arithmetic — it has no
  * hex-to-int cast), an identical IEEE op sequence on identical ints.
  */
object SketchRel {

  private val K = 8
  /** 16^15 = 2^60 — exactly representable in a double. */
  private val SCALE = 1152921504606846976L

  /** First 15 md5 nibbles as a BIGINT, DuckDB side: positional instr
    * arithmetic with exact power-of-16 BIGINT literals.
    */
  private def duckNibbleSum(col: String): String =
    (1 to 15).map { i =>
      s"(instr('0123456789abcdef', substr($col, $i, 1)) - 1) * ${1L << (4 * (15 - i))}"
    }.mkString("(", " + ", ")")

  def kmvUsers(s: SparkSession, d: String): DataFrame = {
    tbl(s, d, "events")
      .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
      .groupBy("event_type")
      .agg(KMinStrings(col("h"), K).as("kmin"))
      .select(col("event_type"),
        size(col("kmin")).cast("bigint").as("n_kept"),
        when(size(col("kmin")) < K, lit(null))
          .otherwise(element_at(col("kmin"), K)).as("kth_hash"),
        when(size(col("kmin")) < K, size(col("kmin")).cast("double"))
          .otherwise(lit((K - 1).toDouble) * lit(SCALE).cast("double") /
            expr(s"CAST(conv(substr(element_at(kmin, $K), 1, 15), 16, 10) AS BIGINT)")
              .cast("double"))
          .as("est_users"))
  }

  /** Range join behind the gate: every purchase opens a 10-minute window;
    * count and sum all of that user's events inside each window, via the
    * binned equi-join of [[graft.ops.RangeJoin]] (DuckDB verifies with a
    * plain inequality join). Windows are deduped first — as with as-of,
    * the interval set is keyed by (user, instant).
    */
  def rangeWindows(s: SparkSession, d: String): DataFrame = {
    val SPAN = 600000000000L // 10 min in nanos
    val e = tbl(s, d, "events")
      .select(col("user_id"), Q.tsNanos(col("ts")).as("t"),
        col("event_type"), col("value"))
    val w = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("t").as("lo"), (col("t") + SPAN).as("hi"))
      .distinct()
    graft.ops.RangeJoin
      .pointInInterval(e, w, Seq("user_id"), "t", "lo", "hi", binWidth = SPAN)
      .groupBy("user_id", "lo")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
  }

  /** Interval-concurrency sweep line: every event opens a 10-minute
    * session interval; per user, the peak number of simultaneously-open
    * intervals (max concurrent sessions — the room-scheduling primitive).
    * Endpoints become +-1 deltas, a user-PARTITIONED running sum walks
    * them in (t, delta) order (closes before opens at a shared instant —
    * half-open intervals), and the peak is the max prefix. Equal-key
    * permutations can reorder INTERMEDIATE prefix values but never the
    * max, so the result is deterministic under any partitioning. At
    * 100 TB: one union, one partitioned window (bounded per-user
    * partitions), one hash aggregate — no self-join, no range join.
    */
  def concurrencyPeak(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val SPAN = 600000000000L
    val iv = tbl(s, d, "events")
      .select(col("user_id"), Q.tsNanos(col("ts")).as("t"))
    val pts = iv.select(col("user_id"), col("t"), lit(1L).as("delta"))
      .unionByName(iv.select(col("user_id"), (col("t") + SPAN).as("t"),
        lit(-1L).as("delta")))
    val w = Window.partitionBy("user_id").orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("open", sum("delta").over(w))
      .groupBy("user_id")
      .agg(expr("count(1) div 2").as("n_intervals"),
        max("open").as("peak"))
  }

  /** Salted skew join: events' 5 hot event_type keys would funnel the whole
    * fact table through 5 reducers in a plain shuffled join. Salting
    * replicates the per-type stats SALT times and keys the join on
    * (event_type, user_id % SALT), spreading each hot key over SALT
    * partitions. Broadcast is always the FIRST choice for a dim this small
    * (q3_dim_join); this query forces the shuffle path (SHUFFLE_HASH hint)
    * to keep the salted shape demonstrable and plan-guarded — the pattern
    * that matters when the build side exceeds broadcast and keys are hot.
    * (AQE skew-split covers sort-merge joins; salting is the hash-join and
    * pre-AQE analog.)
    */
  def saltedJoin(s: SparkSession, d: String): DataFrame = {
    val SALT = 16
    val e = tbl(s, d, "events")
      .select(col("event_type"), col("user_id"),
        col("value").cast("decimal(18,6)").as("v"))
    val stats = e.groupBy("event_type")
      .agg(sum("v").as("type_sum"), count(lit(1)).as("type_n"))
    val salted = stats.withColumn("salt",
      explode(sequence(lit(0), lit(SALT - 1))))
    // coalesce keeps null-user rows joinable (the oracle joins on
    // event_type alone and retains them); salt quality is irrelevant for
    // the handful of null keys
    e.withColumn("salt",
      pmod(coalesce(col("user_id"), lit(0L)), lit(SALT)).cast("int"))
      .hint("SHUFFLE_HASH")
      .join(salted, Seq("event_type", "salt"))
      // above-type-average test in exact arithmetic: v * n > sum
      .filter(col("v") * col("type_n") > col("type_sum"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_above"),
        countDistinct("user_id").as("u_above"))
  }

  /** Typed-Aggregator gate: per-type weighted mean of quantized values,
    * weight = user_id % 10 + 1, all arithmetic exact int64 until the one
    * final double division (replayed identically by the oracle).
    */
  def weightedMean(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    tbl(s, d, "events")
      // a weighted mean is over rows that HAVE a measurement: NULL values
      // are excluded in both engines (and the typed Long encoder is
      // non-nullable by design — the contract is explicit, not an assert)
      .filter(col("value").isNotNull)
      .selectExpr("event_type", "CAST(round(value * 1000000) AS BIGINT) AS qv",
        "user_id % 10 + 1 AS w")
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(graft.functions.WeightedMean.toColumn.name("wmean"))
      .toDF("event_type", "wmean")
  }

  /** HLL sketch gate: per event_type, the FULL 64-register table from the
    * custom [[graft.functions.HllRegisters]] aggregate (Java
    * numberOfLeadingZeros inside the agg), exploded to rows, plus the
    * exact-integer register sum S = sum(2^(55-reg)) and the one-division
    * estimate alpha*m^2*2^55 / S. The DuckDB oracle re-derives every
    * register INDEPENDENTLY — nibble-parsing the same md5 hashes and
    * taking rho from the binary-string length — so a hash match proves
    * the sketch bit-for-bit, not just the estimate's ballpark. Registers
    * (unlike the float harmonic mean) are order- and partitioning-
    * deterministic: elementwise max is commutative and idempotent.
    */
  private val HLL_P = 6
  private val HLL_NUM: Double = 0.709 * 4096.0 * (1L << 55).toDouble

  /** The per-type HLL register aggregation over any (event_type, user_id)
    * relation — batch here, and the streaming STATE in st_sk_hll (the
    * TypedImperativeAggregate's buffer is what the state store holds).
    */
  private[graft] def hllAgg(ev: DataFrame): DataFrame = ev
    .select(col("event_type"), expr(
      "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
      .as("h"))
    .groupBy("event_type")
    .agg(graft.functions.HllRegisters(col("h"), HLL_P).as("regs"))

  /** Register table + estimate view over an aggregated (event_type, regs)
    * relation — the read side shared by the batch and streaming gates.
    * The per-type harmonic sum rides as a window over the 64-register
    * partitions (bounded by the sketch width), so the view is one pass
    * with no self-join — which also lets it run over a streaming memory
    * sink's view, where a self-join trips analyzer reference dedup.
    */
  private[graft] def hllView(aggd: DataFrame): DataFrame = aggd
    .select(col("event_type"), posexplode(col("regs")))
    .select(col("event_type"), col("pos").cast("long").as("bucket"),
      col("col").cast("long").as("reg"))
    .withColumn("s_sum",
      sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - reg AS INT))"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("event_type")))
    .withColumn("est_users", lit(HLL_NUM) / col("s_sum").cast("double"))

  def hllUsers(s: SparkSession, d: String): DataFrame =
    hllView(hllAgg(tbl(s, d, "events")))

  /** DDSketch-style mergeable quantile histogram (Masson et al., VLDB
    * 2019 — relative-error quantiles from log-spaced buckets): values
    * land in sub-bucketed power-of-2 bins (4 per octave, gamma ~ 1.19),
    * the histogram merges by count addition (the mergeability exact
    * percentiles lack — q21's sort-based percentile can't combine across
    * 100 TB partitions; this can, map-side), and quantiles read off the
    * cumulative walk deterministically: rank = ceil(q*N) in exact
    * integers, representative = the bin midpoint 2^(b-3)*(9+2k) — every
    * number in the gate is int64, so the sketch hash-matches a DuckDB
    * replay deriving bins from binary-string lengths.
    */
  def ddsketch(s: SparkSession, d: String): DataFrame =
    ddPost(
      tbl(s, d, "events")
        // a sketch ingests measurements; NULL is not a measurement (and
        // bins of NULL would fabricate a NULL bucket per type)
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          expr("CAST(round(value * 1000000) AS BIGINT)").as("qv"))
        .select(col("event_type"),
          expr("length(bin(qv)) - 1").as("b"),
          expr("shiftright(qv, CAST(length(bin(qv)) - 3 AS INT)) & 3").as("k"))
        .groupBy(col("event_type"), (col("b") * 4 + col("k")).as("bid"))
        .agg(count(lit(1)).as("n")))

  /** Quantile walk over a (event_type, bid, n) histogram — shared by the
    * batch gate and the streaming twin (the sketch is the STATE; the walk
    * is a view over it).
    */
  private[graft] def ddPost(hist: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("bid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum("n").over(w))
    val stats = cum.groupBy("event_type")
      .agg(sum("n").as("nt"),
        collect_list(struct(col("bid"), col("cum"))).as("walk"))
      .select(col("event_type"), col("nt"),
        expr("""array_min(transform(
            filter(walk, x -> x.cum * 2 >= nt + 1), x -> x.bid))""")
          .as("q50_bid"),
        expr("""array_min(transform(
            filter(walk, x -> x.cum * 20 >= nt * 19), x -> x.bid))""")
          .as("q95_bid"))
    def rep(bid: org.apache.spark.sql.Column) =
      expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${bid.toString()} div 4 - 3 AS INT))") *
        (lit(9L) + lit(2L) * (bid % 4))
    cum.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("bid"), col("n"), col("cum"),
        col("nt"), col("q50_bid"), col("q95_bid"),
        rep(col("q50_bid")).as("q50_rep"), rep(col("q95_bid")).as("q95_rep"))
  }

  private[graft] val DDSKETCH_SQL = """
      WITH qv AS (
        SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS qv
        FROM events WHERE value IS NOT NULL),
      bins AS (
        SELECT event_type,
               (len(printf('%b', qv)) - 1) * 4 +
               ((qv >> (len(printf('%b', qv)) - 3)) & 3) AS bid
        FROM qv),
      hist AS (
        SELECT event_type, bid, count(*) AS n
        FROM bins GROUP BY 1, 2),
      cumul AS (
        SELECT event_type, bid, n,
               CAST(sum(n) OVER (PARTITION BY event_type ORDER BY bid
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM hist),
      tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS nt
              FROM hist GROUP BY 1),
      stats AS (
        SELECT c.event_type, max(t.nt) AS nt,
               min(CASE WHEN c.cum * 2 >= t.nt + 1 THEN c.bid END)
                 AS q50_bid,
               min(CASE WHEN c.cum * 20 >= t.nt * 19 THEN c.bid END)
                 AS q95_bid
        FROM cumul c JOIN tot t USING (event_type) GROUP BY 1
      )
      SELECT c.event_type, c.bid, c.n, c.cum,
             CAST(t.nt AS BIGINT) AS nt, t.q50_bid, t.q95_bid,
             (CAST(1 AS BIGINT) << CAST(t.q50_bid // 4 - 3 AS INT))
               * (9 + 2 * (t.q50_bid % 4)) AS q50_rep,
             (CAST(1 AS BIGINT) << CAST(t.q95_bid // 4 - 3 AS INT))
               * (9 + 2 * (t.q95_bid % 4)) AS q95_rep
      FROM cumul c JOIN stats t ON c.event_type = t.event_type"""

  /** The register-table oracle, shared with the streaming twin st_sk_hll
    * (the sketch merge is commutative, so the batch replay is the oracle
    * for any micro-batch arrival order).
    */
  private[graft] val HLL_SQL: String = s"""
      WITH h AS (
        SELECT event_type,
               ${duckNibbleSum("md5(CAST(user_id AS VARCHAR))")} AS h
        FROM events),
      rr AS (
        SELECT event_type, h // ${1L << 54} AS bucket,
               h % ${1L << 54} AS r
        FROM h),
      hits AS (
        SELECT event_type, bucket,
               max(CASE WHEN r = 0 THEN 55
                        ELSE 55 - len(printf('%b', r)) END) AS reg
        FROM rr GROUP BY 1, 2),
      scaffold AS (
        SELECT DISTINCT event_type, unnest(range(0, 64)) AS bucket
        FROM events),
      regs AS (
        SELECT s.event_type, s.bucket,
               CAST(coalesce(h.reg, 0) AS BIGINT) AS reg
        -- IS NOT DISTINCT FROM: a NULL event_type is a GROUP (SQL GROUP
        -- BY semantics, and what the engine's groupBy computes); a plain
        -- equi-join would silently drop its 64 registers
        FROM scaffold s LEFT JOIN hits h
          ON s.event_type IS NOT DISTINCT FROM h.event_type
         AND s.bucket = h.bucket),
      stats AS (
        SELECT event_type,
               CAST(sum(CAST(1 AS BIGINT) << CAST(55 - reg AS INT))
                 AS BIGINT) AS s_sum
        FROM regs GROUP BY 1)
      SELECT r.event_type, r.bucket, r.reg, t.s_sum,
             $HLL_NUM / CAST(t.s_sum AS DOUBLE) AS est_users
      FROM regs r JOIN stats t
        ON r.event_type IS NOT DISTINCT FROM t.event_type"""

  def all: Seq[Q] = Seq(
    Q("sk_ddsketch", ddsketch, Some(DDSKETCH_SQL)),
    Q("sk_hll_users", hllUsers, Some(HLL_SQL)),
    Q("ag_weighted_mean", weightedMean, Some("""
      SELECT event_type,
             CAST(CAST(sum(CAST(round(value * 1000000) AS BIGINT) * (user_id % 10 + 1)) AS BIGINT) AS DOUBLE) /
             CAST(CAST(sum(user_id % 10 + 1) AS BIGINT) AS DOUBLE) AS wmean
      FROM events WHERE value IS NOT NULL GROUP BY event_type""")),
    Q("js_salted", saltedJoin, Some("""
      WITH e AS (
        SELECT event_type, user_id, CAST(value AS DECIMAL(18,6)) AS v
        FROM events),
      stats AS (
        SELECT event_type, sum(v) AS type_sum, count(*) AS type_n
        FROM e GROUP BY event_type)
      SELECT e.event_type, count(*) AS n_above,
             count(DISTINCT e.user_id) AS u_above
      FROM e JOIN stats ON e.event_type = stats.event_type
      WHERE e.v * stats.type_n > stats.type_sum
      GROUP BY e.event_type""")),
    Q("rj_windows", rangeWindows, Some("""
      WITH e AS (
        SELECT user_id, epoch_ns(ts) AS t, event_type, value FROM events),
      w AS (
        SELECT DISTINCT user_id, t AS lo, t + 600000000000 AS hi
        FROM e WHERE event_type = 'purchase')
      SELECT w.user_id, w.lo, count(*) AS n_events,
             CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM w JOIN e ON e.user_id = w.user_id AND e.t >= w.lo AND e.t <= w.hi
      GROUP BY w.user_id, w.lo""")),
    Q("rj_concurrency", concurrencyPeak, Some("""
      WITH iv AS (SELECT user_id, epoch_ns(ts) AS t FROM events),
      pts AS (
        SELECT user_id, t, 1 AS delta FROM iv
        UNION ALL SELECT user_id, t + 600000000000, -1 FROM iv),
      r AS (
        SELECT user_id,
               sum(delta) OVER (PARTITION BY user_id ORDER BY t, delta
                                ROWS UNBOUNDED PRECEDING) AS open
        FROM pts)
      SELECT user_id, CAST(count(*) // 2 AS BIGINT) AS n_intervals,
             CAST(max(open) AS BIGINT) AS peak
      FROM r GROUP BY user_id""")),
    Q("sk_kmv_users", kmvUsers, Some(s"""
      WITH h AS (
        SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS hh
        FROM events),
      l AS (
        SELECT event_type, list(hh ORDER BY hh) AS ls, count(*) AS nd
        FROM h GROUP BY event_type),
      x AS (
        SELECT event_type, nd,
               CASE WHEN nd < $K THEN NULL ELSE ls[$K] END AS kth_hash
        FROM l)
      SELECT event_type,
             CAST(LEAST(nd, $K) AS BIGINT) AS n_kept,
             kth_hash,
             CASE WHEN kth_hash IS NULL THEN CAST(nd AS DOUBLE)
                  ELSE CAST(${K - 1} AS DOUBLE) * CAST($SCALE AS DOUBLE) /
                       CAST(${duckNibbleSum("kth_hash")} AS DOUBLE)
             END AS est_users
      FROM x""")),
    Q("sk_kmv_overlap", kmvOverlap, Some(s"""
      WITH h AS (
        SELECT DISTINCT event_type,
               CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS period,
               md5(CAST(user_id AS VARCHAR)) AS hh
        FROM events),
      sk AS (
        SELECT event_type, period,
               (list(hh ORDER BY hh))[1 : $K] AS kmin
        FROM h GROUP BY event_type, period),
      ab AS (
        SELECT event_type,
               max(CASE WHEN period = 'a' THEN kmin END) AS ka,
               max(CASE WHEN period = 'b' THEN kmin END) AS kb
        FROM sk GROUP BY event_type),
      u AS (
        SELECT event_type, ka, kb,
               list_sort(list_distinct(ka || kb))[1 : $K] AS ku
        FROM ab),
      x AS (
        SELECT event_type,
               CAST(len(ka) AS BIGINT) AS na_kept,
               CAST(len(kb) AS BIGINT) AS nb_kept,
               CASE WHEN len(ku) >= $K THEN ku[$K] END AS union_kth,
               CAST(len(list_filter(ku, x -> list_contains(ka, x)
                                           AND list_contains(kb, x)))
                    AS BIGINT) AS k_shared
        FROM u)
      SELECT event_type, na_kept, nb_kept, union_kth, k_shared,
             CASE WHEN union_kth IS NULL THEN NULL
                  ELSE CAST(${K - 1} AS DOUBLE) * CAST($SCALE AS DOUBLE) /
                       CAST(${duckNibbleSum("union_kth")} AS DOUBLE)
             END AS est_union
      FROM x""")),
    Q("sk_kmv_diff", kmvDiff, Some(s"""
      WITH h AS (
        SELECT DISTINCT event_type,
               CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS period,
               md5(CAST(user_id AS VARCHAR)) AS hh
        FROM events),
      sk AS (
        SELECT event_type, period,
               (list(hh ORDER BY hh))[1 : $K] AS kmin
        FROM h GROUP BY event_type, period),
      ab AS (
        SELECT event_type,
               coalesce(max(CASE WHEN period = 'a' THEN kmin END),
                        CAST([] AS VARCHAR[])) AS ka,
               coalesce(max(CASE WHEN period = 'b' THEN kmin END),
                        CAST([] AS VARCHAR[])) AS kb
        FROM sk GROUP BY event_type),
      u AS (
        SELECT event_type, ka, kb,
               list_sort(list_distinct(ka || kb))[1 : $K] AS ku
        FROM ab),
      x AS (
        SELECT event_type,
               CASE WHEN len(ku) >= $K THEN ku[$K] END AS union_kth,
               CAST(len(list_filter(ku, x -> list_contains(ka, x)
                        AND NOT list_contains(kb, x))) AS BIGINT) AS k_a_only,
               CAST(len(list_filter(ku, x -> list_contains(kb, x)
                        AND NOT list_contains(ka, x))) AS BIGINT) AS k_b_only
        FROM u),
      e AS (
        SELECT event_type, k_a_only, k_b_only, union_kth,
               CASE WHEN union_kth IS NULL THEN NULL
                    ELSE CAST(${K - 1} AS DOUBLE) * CAST($SCALE AS DOUBLE) /
                         CAST(${duckNibbleSum("union_kth")} AS DOUBLE)
               END AS est_union
        FROM x)
      SELECT event_type, k_a_only, k_b_only, union_kth, est_union,
             k_a_only / $K * est_union AS est_diff_ab,
             k_b_only / $K * est_union AS est_diff_ba
      FROM e""")))

  /** KMV set operations across two event periods (even/odd event_id — the
    * "this crawl vs last crawl" split; a timestamp boundary is the same
    * shape). Per event type, each period keeps its k=8 smallest md5 user
    * hashes; the UNION sketch is the k smallest of the merged k-min sets
    * (exact: kth-min(union) <= each side's kth-min, so every union k-min
    * that belongs to a side is inside that side's kept set) — which also
    * makes `k_shared`, the union k-mins present in BOTH sketches, the exact
    * numerator of the KMV Jaccard estimator J = k_shared/k, and
    * est_inter = J * est_union recoverable downstream without touching raw
    * data. One pass, O(k) state per (type, period), deterministic under any
    * partitioning — both engines rebuild the identical sketch bits.
    */
  def kmvOverlap(s: SparkSession, d: String): DataFrame = {
    tbl(s, d, "events")
      .select(col("event_type"),
        when(col("event_id") % 2 === 0, "a").otherwise("b").as("period"),
        md5(col("user_id").cast("string")).as("h"))
      .groupBy("event_type", "period")
      .agg(KMinStrings(col("h"), K).as("kmin"))
      .groupBy("event_type")
      .agg(max(when(col("period") === "a", col("kmin"))).as("ka"),
        max(when(col("period") === "b", col("kmin"))).as("kb"))
      // coalesce: DuckDB's list concat treats a NULL side as empty (a
      // period with no events still yields the other period's union
      // sketch); Spark's array_union would return NULL instead
      .withColumn("ku", expr(
        s"""slice(array_sort(array_union(
              coalesce(ka, cast(array() as array<string>)),
              coalesce(kb, cast(array() as array<string>)))), 1, $K)"""))
      .select(col("event_type"),
        size(col("ka")).cast("bigint").as("na_kept"),
        size(col("kb")).cast("bigint").as("nb_kept"),
        when(size(col("ku")) >= K, element_at(col("ku"), K)).as("union_kth"),
        expr("""CAST(size(filter(ku, x -> array_contains(ka, x)
                                      AND array_contains(kb, x))) AS BIGINT)""")
          .as("k_shared"))
      .withColumn("est_union",
        when(col("union_kth").isNull, lit(null).cast("double"))
          .otherwise(lit((K - 1).toDouble) * lit(SCALE).cast("double") /
            expr("CAST(conv(substr(union_kth, 1, 15), 16, 10) AS BIGINT)")
              .cast("double")))
  }

  /** KMV set-DIFFERENCE algebra over the same two-period sketches as
    * `kmvOverlap` — |A \ B| and |B \ A| ("users lost since last crawl" /
    * "users gained"). The membership test is EXACT within the union
    * sample: the union's kth min is <= each side's kth min, so any union
    * k-min that belongs to a side is inside that side's kept set — absence
    * from the kept set proves absence from the side below the threshold.
    * est(A \ B) = (a-only fraction of the union sample) * est(union); an
    * empty period coalesces to the empty sketch in BOTH engines so the
    * whole union counts as the other side's difference (a NULL side would
    * instead null the membership predicate and zero the count). Same one
    * pass, O(k) state per (type, period) as the other KMV gates.
    */
  def kmvDiff(s: SparkSession, d: String): DataFrame = {
    tbl(s, d, "events")
      .select(col("event_type"),
        when(col("event_id") % 2 === 0, "a").otherwise("b").as("period"),
        md5(col("user_id").cast("string")).as("h"))
      .groupBy("event_type", "period")
      .agg(KMinStrings(col("h"), K).as("kmin"))
      .groupBy("event_type")
      .agg(max(when(col("period") === "a", col("kmin"))).as("ka0"),
        max(when(col("period") === "b", col("kmin"))).as("kb0"))
      .withColumn("ka", expr("coalesce(ka0, cast(array() as array<string>))"))
      .withColumn("kb", expr("coalesce(kb0, cast(array() as array<string>))"))
      .withColumn("ku", expr(
        s"slice(array_sort(array_union(ka, kb)), 1, $K)"))
      .withColumn("union_kth",
        when(size(col("ku")) >= K, element_at(col("ku"), K)))
      .withColumn("k_a_only", expr(
        """CAST(size(filter(ku, x -> array_contains(ka, x)
                                 AND NOT array_contains(kb, x))) AS BIGINT)"""))
      .withColumn("k_b_only", expr(
        """CAST(size(filter(ku, x -> array_contains(kb, x)
                                 AND NOT array_contains(ka, x))) AS BIGINT)"""))
      .withColumn("est_union",
        when(col("union_kth").isNull, lit(null).cast("double"))
          .otherwise(lit((K - 1).toDouble) * lit(SCALE).cast("double") /
            expr("CAST(conv(substr(union_kth, 1, 15), 16, 10) AS BIGINT)")
              .cast("double")))
      .withColumn("est_diff_ab", expr(s"k_a_only / $K * est_union"))
      .withColumn("est_diff_ba", expr(s"k_b_only / $K * est_union"))
      .select("event_type", "k_a_only", "k_b_only", "union_kth",
        "est_union", "est_diff_ab", "est_diff_ba")
  }
}
