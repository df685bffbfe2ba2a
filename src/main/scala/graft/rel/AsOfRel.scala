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
  * Times are nano-epoch longs truncated to micros (`ts div 1000 * 1000`)
  * for parity with `epoch_ns` over DuckDB's micro-precision timestamps —
  * same rule as st_sessionize. The state side is grouped to one row per
  * (user, instant) because as-of is only well-defined with unique
  * key-instants.
  */
object AsOfRel {

  def asofStates(s: SparkSession, d: String): DataFrame = {
    // SQL-equality parity: the operator's key matching is null-safe, the
    // oracle's `e.user_id = s.user_id` is not — drop null keys up front
    val e = tbl(s, d, "events")
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), expr("ts div 1000 * 1000").as("t"),
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
  def asofInterp(s: SparkSession, d: String): DataFrame = {
    val ev = tbl(s, d, "events")
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), expr("ts div 1000 * 1000").as("t"),
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
    val both = AsOf.join(prev.withColumn("nt", -col("t")), nextStates,
        Seq("user_id"), "nt", "n_t")
      .toDF("user_id", "t", "prev_t", "qv0", "nt", "u3", "n_t2", "qv1")
      .select(col("user_id"), col("t"), col("prev_t"), col("qv0"),
        (-col("n_t2")).as("next_t"), col("qv1"))
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

  def all: Seq[Q] = Seq(
    Q("aj_interp", asofInterp, Some("""
      WITH e AS (
        SELECT user_id, epoch_ns(ts) AS t, event_type,
               CAST(round(value * 1000000) AS BIGINT) AS qv
        FROM events WHERE user_id IS NOT NULL),
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
          ON p.user_id = s.user_id AND p.t <= s.s_t)
      SELECT user_id, t, prev_t, next_t, qv0, qv1,
             CASE WHEN prev_t IS NULL OR next_t IS NULL THEN NULL
                  WHEN next_t = prev_t THEN CAST(qv0 AS DOUBLE)
                  ELSE (CAST(qv0 AS DOUBLE) * CAST(next_t - t AS DOUBLE)
                      + CAST(qv1 AS DOUBLE) * CAST(t - prev_t AS DOUBLE))
                       / CAST(next_t - prev_t AS DOUBLE)
             END AS interp
      FROM n""")),
    Q("aj_asof", asofStates, Some("""
      WITH e AS (
        SELECT user_id, epoch_ns(ts) AS t, event_type, value FROM events
        WHERE user_id IS NOT NULL),
      s AS (
        SELECT user_id, t AS s_t, max(value) AS s_value
        FROM e WHERE event_type = 'purchase' GROUP BY user_id, t)
      SELECT e.user_id, e.t, e.event_type, e.value, s.s_t, s.s_value
      FROM e ASOF LEFT JOIN s
        ON e.user_id = s.user_id AND e.t >= s.s_t""")))
}
