package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.AsOf
import Q.tbl

/** As-of join behind the DuckDB gate: every event is annotated with the
  * user's most recent purchase state at-or-before the event time, via the
  * custom [[graft.plans.AsOfJoinExec]] operator; DuckDB's native
  * `ASOF LEFT JOIN` is the oracle.
  *
  * Times are nano-epoch longs derived from the micro-precision event
  * timestamps (via [[graft.rel.Q.tsNanos]]) for parity with DuckDB's
  * `epoch_ns` over the same column — same rule as st_sessionize. The state side is grouped to one row per
  * (user, instant) because as-of is only well-defined with unique
  * key-instants.
  */
object AsOfRel {

  /** Oracle twin of [[prevNext]]: DuckDB's native ASOF joins bracket each
    * event with the previous and next purchase state; shared by the
    * aj_interp and aj_nearest oracles (relation `n`).
    */
  private val PREVNEXT_CTES = """
      WITH e AS (
        SELECT user_id, epoch_ns(ts) AS t, event_type,
               CAST(round(value * 1000000) AS BIGINT) AS qv
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      s AS (
        SELECT user_id, t AS s_t, max(qv) AS sqv
        FROM e WHERE event_type = 'purchase' GROUP BY user_id, t),
      p AS (
        SELECT e.user_id, e.t, s.s_t AS prev_t, s.sqv AS qv0
        FROM (SELECT user_id, t FROM e) e ASOF LEFT JOIN s
          ON e.user_id = s.user_id AND e.t >= s.s_t),
      n AS (
        SELECT p.user_id, p.t, p.prev_t, p.qv0, s.s_t AS next_t,
               s.sqv AS qv1
        FROM p ASOF LEFT JOIN s
          ON p.user_id = s.user_id AND p.t <= s.s_t)"""

  def asofStates(s: SparkSession, d: String): DataFrame = {
    // SQL-equality parity: the operator's key matching is null-safe, the
    // oracle's `e.user_id = s.user_id` is not — drop null keys up front.
    // The TIME key gets the same rule: an event with no timestamp cannot
    // take part in an as-of merge (shared by all aj_* gates + oracles)
    val e = tbl(s, d, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), Q.tsNanos(col("ts")).as("t"),
        col("event_type"), col("value"))
    val states = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("t").as("s_t"))
      .agg(max("value").as("s_value"))
    AsOf.join(e, states, Seq("user_id"), "t", "s_t")
      .toDF("user_id", "t", "event_type", "value", "u2", "s_t", "s_value")
      .drop("u2")
  }

  /** As-of linear interpolation — the time-series resample a feature
    * pipeline runs between state observations: every event is bracketed by
    * the user's nearest purchase state at-or-before AND at-or-after its
    * time, both through the custom [[graft.plans.AsOfJoinExec]] (the
    * forward bracket via time negation — as-of on negated time IS
    * nearest-at-or-after), then linearly interpolated. Values are
    * micro-quantized BIGINTs; the interpolation is a FIXED sequence of
    * IEEE double ops on exact integers ((qv0*dtn + qv1*dtp) / dt, same
    * parenthesization both engines) so the doubles agree bit-for-bit.
    * DuckDB's native ASOF LEFT JOIN in both directions is the oracle.
    */
  /** Shared prev/next bracketing pass: for every event, the user's latest
    * purchase state at-or-before it AND the earliest at-or-after it — two
    * runs of the custom as-of operator (the forward direction rides the
    * same backward merge over negated time). Feeds both the interpolation
    * (aj_interp) and the nearest-match (aj_nearest) surfaces.
    */
  private def prevNext(s: SparkSession, d: String): DataFrame = {
    val ev = tbl(s, d, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), Q.tsNanos(col("ts")).as("t"),
        col("event_type"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("qv"))
    val states = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("t").as("s_t"))
      .agg(max("qv").as("sqv"))
    val prev = AsOf.join(ev.select("user_id", "t"), states,
        Seq("user_id"), "t", "s_t")
      .toDF("user_id", "t", "u2", "prev_t", "qv0").drop("u2")
    val nextStates = states.select(col("user_id"),
      (-col("s_t")).as("n_t"), col("sqv"))
    AsOf.join(prev.withColumn("nt", -col("t")), nextStates,
        Seq("user_id"), "nt", "n_t")
      .toDF("user_id", "t", "prev_t", "qv0", "nt", "u3", "n_t2", "qv1")
      .select(col("user_id"), col("t"), col("prev_t"), col("qv0"),
        (-col("n_t2")).as("next_t"), col("qv1"))
  }

  def asofInterp(s: SparkSession, d: String): DataFrame = {
    val both = prevNext(s, d)
    both.select(col("user_id"), col("t"), col("prev_t"), col("next_t"),
      col("qv0"), col("qv1"),
      when(col("prev_t").isNull || col("next_t").isNull,
        lit(null).cast("double"))
        .when(col("next_t") === col("prev_t"), col("qv0").cast("double"))
        .otherwise(
          (col("qv0").cast("double") * (col("next_t") - col("t")).cast("double")
            + col("qv1").cast("double") * (col("t") - col("prev_t")).cast("double"))
            / (col("next_t") - col("prev_t")).cast("double"))
        .as("interp"))
  }

  /** merge_asof direction='nearest': every event takes the purchase state
    * CLOSEST in time, either side, tie to the earlier one (pandas'
    * convention). Composition of the same two custom as-of merges as
    * aj_interp — nearest is prev/next bracketing plus an integer distance
    * argmin, so no third pass and no new shuffle. One-sided brackets fall
    * back to the side that exists; a user with no purchases yields NULLs
    * (left-outer contract).
    */
  def asofNearest(s: SparkSession, d: String): DataFrame = {
    prevNext(s, d).select(col("user_id"), col("t"),
      when(col("prev_t").isNull && col("next_t").isNull,
        lit(null).cast("long"))
        .when(col("next_t").isNull, col("prev_t"))
        .when(col("prev_t").isNull, col("next_t"))
        .when(col("t") - col("prev_t") <= col("next_t") - col("t"),
          col("prev_t"))
        .otherwise(col("next_t")).as("near_t"),
      when(col("prev_t").isNull && col("next_t").isNull,
        lit(null).cast("long"))
        .when(col("next_t").isNull, col("qv0"))
        .when(col("prev_t").isNull, col("qv1"))
        .when(col("t") - col("prev_t") <= col("next_t") - col("t"),
          col("qv0"))
        .otherwise(col("qv1")).as("near_qv"))
      .withColumn("dist", abs(col("t") - col("near_t")))
  }

  /** Regular-grid resample with gap fill — the downsampling pass a metrics
    * or feature store runs over raw events: an hourly grid per user
    * (spanning the corpus' hour-truncated min..max event time), each grid
    * point carrying the user's last observed value at-or-before it
    * (carry-forward fill) and the count of events in the trailing hour.
    *
    * Spark-first shape: NO join — the grid rows are unioned with the
    * events and a single partitioned window pass computes both outputs:
    * `last(v) ignoreNulls` over (t, is_grid) rows-frame for the fill
    * (events order before grid markers at the same instant, so
    * at-or-before is inclusive), and `count(v)` over a RANGE frame of
    * (HOUR-1) ns for the trailing-hour count (grid markers carry null v,
    * so they never count themselves). One shuffle on user_id, both
    * windows share it; the grid is |users| x |hours| rows, never a
    * per-event blowup. DuckDB's generate_series + the same two windows is
    * the oracle.
    */
  def resample(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val HOUR = 3600L * 1000000000L
    val ev = tbl(s, d, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), Q.tsNanos(col("ts")).as("t"),
        col("value"))
      .groupBy("user_id", "t").agg(max("value").as("v"))
    val bounds = ev.agg(
      expr(s"(min(t) div $HOUR) * $HOUR").as("h0"),
      expr(s"(max(t) div $HOUR) * $HOUR").as("h1"))
    val grid = ev.select("user_id").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("user_id"),
        explode(expr(s"sequence(h0, h1, $HOUR)")).as("t"))
    val unioned = ev.select(col("user_id"), col("t"), col("v"),
        lit(0).as("is_grid"))
      .unionByName(grid.select(col("user_id"), col("t"),
        lit(null).cast("double").as("v"), lit(1).as("is_grid")))
    val wFill = Window.partitionBy("user_id").orderBy(col("t"), col("is_grid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wHour = Window.partitionBy("user_id").orderBy(col("t"))
      .rangeBetween(-(HOUR - 1), 0)
    unioned
      .withColumn("fill_v", last(col("v"), ignoreNulls = true).over(wFill))
      .withColumn("n_1h", count(col("v")).over(wHour))
      .filter(col("is_grid") === 1)
      .select(col("user_id"), col("t").as("gt"), col("fill_v"), col("n_1h"))
  }

  /** Point-in-time feature join with a staleness tolerance — the
    * leakage-safe training-set join a feature store runs (pandas
    * `merge_asof(tolerance=...)`): each event takes the user's latest
    * purchase feature at-or-before its time, but a feature older than the
    * 3-day bound is treated as ABSENT (stale features are worse than no
    * feature). Composes the same custom [[graft.plans.AsOfJoinExec]] —
    * tolerance is a post-join null-out, so the O(n+m) merge and its
    * one-exchange-per-side plan are unchanged at any scale.
    */
  def pitFeatures(s: SparkSession, d: String): DataFrame = {
    val tol = 259200000000000L // 3 days in nanos
    val e = tbl(s, d, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), Q.tsNanos(col("ts")).as("t"),
        col("event_type"))
    val states = tbl(s, d, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type") === "purchase")
      .select(col("user_id"), Q.tsNanos(col("ts")).as("s_t"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("sqv"))
      .groupBy("user_id", "s_t").agg(max("sqv").as("sqv"))
    val fresh = col("s_t").isNotNull && (col("t") - col("s_t")) <= tol
    AsOf.join(e, states, Seq("user_id"), "t", "s_t")
      .toDF("user_id", "t", "event_type", "u2", "s_t", "sqv")
      .select(col("user_id"), col("t"), col("event_type"),
        when(fresh, col("sqv")).as("feat"),
        when(fresh, col("s_t")).as("feat_t"))
  }

  /** Training-matrix assembly — the end-to-end feature-store build, three
    * operator families in ONE query: every purchase (the label row) takes
    * (1) the user's latest STRICTLY-PRIOR click value through the custom
    * AsOfJoinExec (leakage-safe: the as-of time is t-1us, so a feature
    * stamped at the label instant never leaks in), (2) the trailing-7-day
    * event count through an event-time RANGE frame ending 1us before the
    * label, and (3) a static embedding score (the user's vector dotted
    * with the fixed probe vector, exact ints, broadcast). This is the
    * query a reference user migrating a training pipeline actually runs;
    * each constituent shape is independently gated elsewhere
    * (aj_pit_features, q31_range_frame, vec_dot_pairs).
    */
  def trainingMatrix(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = tbl(s, d, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), Q.tsMicros(col("ts")).as("t"),
        col("event_id"), col("event_type"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("qv"))
    // trailing-7d behavioral count at every event, label rows filtered after
    val w = Window.partitionBy("user_id").orderBy("t")
      .rangeBetween(-604800000000L, -1L)
    val withBehav = ev.withColumn("f_n7d", count(lit(1)).over(w))
    val labels = withBehav.filter(col("event_type") === "purchase")
      .select(col("user_id"), (col("t") - 1L).as("asof_t"), col("t"),
        col("event_id"), col("f_n7d"))
    val clickStates = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("t").as("s_t")).agg(max("qv").as("sqv"))
    val pit = AsOf.join(labels, clickStates, Seq("user_id"), "asof_t", "s_t")
      .toDF("user_id", "asof_t", "t", "event_id", "f_n7d", "u2", "s_t",
        "f_click")
      .select(col("user_id"), col("t"), col("event_id"), col("f_n7d"),
        col("f_click"))
    val quantSql =
      "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    val uvec = tbl(s, d, "embeddings")
      .filter(col("embedding").isNotNull) // NULL-vector contract
      .select(col("vec_id"), expr(quantSql).as("qv"))
    val probe = uvec.filter(col("vec_id") === 0)
      .select(col("qv").as("pv"))
    pit.join(uvec, pit("user_id") % 500 === uvec("vec_id"))
      .crossJoin(broadcast(probe))
      .select(col("user_id"), col("t"), col("event_id"), col("f_n7d"),
        col("f_click"),
        graft.functions.VectorFunctions.long_dot(col("qv"), col("pv"))
          .as("f_embed"))
  }

  def all: Seq[Q] = Seq(
    Q("ft_training_matrix", trainingMatrix, Some("""
      WITH e AS (
        SELECT user_id, epoch_us(ts) AS t, event_id, event_type,
               CAST(round(value * 1000000) AS BIGINT) AS qv
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      b AS (
        SELECT user_id, t, event_id, event_type,
               count(*) OVER (PARTITION BY user_id ORDER BY t
                 RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)
                 AS f_n7d
        FROM e),
      labels AS (
        SELECT user_id, t - 1 AS asof_t, t, event_id, f_n7d
        FROM b WHERE event_type = 'purchase'),
      cs AS (
        SELECT user_id, t AS s_t, max(qv) AS sqv
        FROM e WHERE event_type = 'click' GROUP BY 1, 2),
      pit AS (
        SELECT l.user_id, l.t, l.event_id, l.f_n7d, cs.sqv AS f_click
        FROM labels l ASOF LEFT JOIN cs
          ON l.user_id = cs.user_id AND l.asof_t >= cs.s_t),
      qv AS (SELECT vec_id,
                    list_transform(embedding,
                      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                      AS qv
             FROM embeddings WHERE embedding IS NOT NULL),
      probe AS (SELECT qv AS pv FROM qv WHERE vec_id = 0)
      SELECT p.user_id, p.t, p.event_id, p.f_n7d, p.f_click,
             CAST(list_dot_product(CAST(u.qv AS DOUBLE[]),
                                   CAST(pr.pv AS DOUBLE[])) AS BIGINT)
               AS f_embed
      FROM pit p JOIN qv u ON p.user_id % 500 = u.vec_id, probe pr""")),
    Q("aj_pit_features", pitFeatures, Some("""
      WITH e AS (
        SELECT user_id, epoch_ns(ts) AS t, event_type
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      s AS (
        SELECT user_id, epoch_ns(ts) AS s_t,
               max(CAST(round(value * 1000000) AS BIGINT)) AS sqv
        FROM events
        WHERE event_type = 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1, 2),
      j AS (
        SELECT e.user_id, e.t, e.event_type, s.s_t, s.sqv
        FROM e ASOF LEFT JOIN s
          ON e.user_id = s.user_id AND e.t >= s.s_t)
      SELECT user_id, t, event_type,
             CASE WHEN s_t IS NOT NULL AND t - s_t <= 259200000000000
                  THEN sqv END AS feat,
             CASE WHEN s_t IS NOT NULL AND t - s_t <= 259200000000000
                  THEN s_t END AS feat_t
      FROM j""")),
    Q("aj_resample", resample, Some("""
      WITH e AS (
        SELECT user_id, t, max(value) AS v
        FROM (SELECT user_id, epoch_ns(ts) AS t, value FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL)
        GROUP BY user_id, t),
      b AS (
        SELECT (min(t) // 3600000000000) * 3600000000000 AS h0,
               (max(t) // 3600000000000) * 3600000000000 AS h1 FROM e),
      g AS (
        SELECT u.user_id, unnest(generate_series(b.h0, b.h1, 3600000000000)) AS t
        FROM (SELECT DISTINCT user_id FROM e) u CROSS JOIN b),
      allr AS (
        SELECT user_id, t, v, 0 AS is_grid FROM e
        UNION ALL
        SELECT user_id, t, NULL AS v, 1 AS is_grid FROM g),
      w AS (
        SELECT user_id, t, is_grid,
               last_value(v IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY t, is_grid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill_v,
               count(v) OVER (
                 PARTITION BY user_id ORDER BY t
                 RANGE BETWEEN 3599999999999 PRECEDING AND CURRENT ROW) AS n_1h
        FROM allr)
      SELECT user_id, t AS gt, fill_v, n_1h FROM w WHERE is_grid = 1""")),
    Q("aj_interp", asofInterp, Some(PREVNEXT_CTES + """
      SELECT user_id, t, prev_t, next_t, qv0, qv1,
             CASE WHEN prev_t IS NULL OR next_t IS NULL THEN NULL
                  WHEN next_t = prev_t THEN CAST(qv0 AS DOUBLE)
                  ELSE (CAST(qv0 AS DOUBLE) * CAST(next_t - t AS DOUBLE)
                      + CAST(qv1 AS DOUBLE) * CAST(t - prev_t AS DOUBLE))
                       / CAST(next_t - prev_t AS DOUBLE)
             END AS interp
      FROM n""")),
    Q("aj_nearest", asofNearest, Some(PREVNEXT_CTES + """
      , pick AS (
        SELECT user_id, t,
               CASE WHEN prev_t IS NULL AND next_t IS NULL THEN NULL
                    WHEN next_t IS NULL THEN prev_t
                    WHEN prev_t IS NULL THEN next_t
                    WHEN t - prev_t <= next_t - t THEN prev_t
                    ELSE next_t END AS near_t,
               CASE WHEN prev_t IS NULL AND next_t IS NULL THEN NULL
                    WHEN next_t IS NULL THEN qv0
                    WHEN prev_t IS NULL THEN qv1
                    WHEN t - prev_t <= next_t - t THEN qv0
                    ELSE qv1 END AS near_qv
        FROM n)
      SELECT user_id, t, near_t, near_qv, abs(t - near_t) AS dist
      FROM pick""")),
    Q("aj_asof", asofStates, Some("""
      WITH e AS (
        SELECT user_id, epoch_ns(ts) AS t, event_type, value FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      s AS (
        SELECT user_id, t AS s_t, max(value) AS s_value
        FROM e WHERE event_type = 'purchase' GROUP BY user_id, t)
      SELECT e.user_id, e.t, e.event_type, e.value, s.s_t, s.s_value
      FROM e ASOF LEFT JOIN s
        ON e.user_id = s.user_id AND e.t >= s.s_t""")))
}
