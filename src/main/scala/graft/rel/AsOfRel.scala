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

  def all: Seq[Q] = Seq(
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
