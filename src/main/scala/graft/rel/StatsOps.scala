package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q.tbl

/** Experiment / time-series statistics over the event log — the analytics a
  * product team runs on the SAME events relation the pipelines ingest:
  * A/B-test significance (chi-square on user-level conversion, Welch's t on
  * a continuous metric), series autocorrelation, per-entity exponential
  * smoothing, and multi-touch attribution.
  *
  * Determinism discipline (the hash gate compares bit-for-bit): every
  * statistic is computed as a STRAIGHT-LINE double formula over EXACT
  * integer/decimal aggregates, with the formula text structured identically
  * on both engines — `+ - * /` and `sqrt` are IEEE-754 correctly-rounded,
  * so identical inputs through an identical op tree give identical bits.
  * No aggregated raw double ever crosses the gate (summation order is the
  * only nondeterminism, and it is confined to exact types).
  */
object StatsOps {

  /** Per-arm chi-square term over the 2×K contingency table, written once
    * and spliced verbatim into BOTH engines' expressions so the double op
    * tree is identical. `cA`/`nA` are exact BIGINT conditional aggregates;
    * `C`/`N` the grand totals. int/int division yields DOUBLE in both
    * Spark SQL and DuckDB, and both cast the exact ints to double first.
    */
  private def chiTerm(c: String, n: String, spark: Boolean): String = {
    // identical op tree in both engines; the OUTER division by the expected
    // cell count goes through try_divide on the Spark side so an empty arm
    // (expected 0) yields NULL like DuckDB's x/0 instead of an ANSI error
    def div(a: String, b: String) =
      if (spark) s"try_divide($a, $b)" else s"$a/$b"
    div(s"($c - $n*ct/nt)*($c - $n*ct/nt)", s"($n*ct/nt)") +
      " + " + div(s"(($n-$c) - $n*(nt-ct)/nt)*(($n-$c) - $n*(nt-ct)/nt)",
        s"($n*(nt-ct)/nt)")
  }

  private def chisqExpr(spark: Boolean): String =
    s"${chiTerm("c0", "n0", spark)} + ${chiTerm("c1", "n1", spark)} + " +
      chiTerm("c2", "n2", spark)

  def all: Seq[Q] = Seq(

    // A/B chi-square — the user-level conversion test: arm = user_id % 3
    // (a deterministic splitter both engines replay), converted = has at
    // least one high-value purchase (value ≥ 150: the distribution is
    // heavy-tailed with median ~34, and EVERY user has some purchase, so
    // the raw flag would saturate the table and zero the non-converted
    // expected cell). Two hash aggregates (user collapse, then
    // a 1-row conditional fold) and zero joins; at 100 TB the user
    // collapse is the only shuffle and it is the minimal one the metric
    // definition requires. The statistic itself is a straight-line double
    // expression over the six exact cell counts, spliced from the same
    // text into both engines.
    Q("ab_chisq", (s, d) => {
      tbl(s, d, "events")
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase" && col("value") >= 150.0, 1L)
          .otherwise(0L)).as("conv"))
        .withColumn("arm", pmod(col("user_id"), lit(3L)))
        .groupBy()
        .agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("c0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("c1"),
          sum(when(col("arm") === 2, 1L).otherwise(0L)).as("n2"),
          sum(when(col("arm") === 2, col("conv")).otherwise(0L)).as("c2"))
        .withColumn("nt", col("n0") + col("n1") + col("n2"))
        .withColumn("ct", col("c0") + col("c1") + col("c2"))
        .withColumn("chisq", expr(chisqExpr(spark = true)))
    }, Some(s"""
      WITH u AS (
        SELECT user_id, ((user_id % 3) + 3) % 3 AS arm,
               max(CASE WHEN event_type = 'purchase' AND value >= 150.0
                        THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY 1, 2),
      g AS (
        SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1,
               CAST(sum(CASE WHEN arm = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(sum(CASE WHEN arm = 2 THEN conv ELSE 0 END) AS BIGINT) AS c2
        FROM u)
      SELECT n0, c0, n1, c1, n2, c2, nt, ct, ${chisqExpr(spark = false)} AS chisq
      FROM (SELECT *, n0+n1+n2 AS nt, c0+c1+c2 AS ct FROM g)""")),

    // A/B Welch's t — the continuous-metric test: arm = user_id % 2, metric
    // = event value (exact decimal cast, squared IN decimal so Σx and Σx²
    // are exact; both engines round the same exact sum to the same double).
    // One conditional-fold aggregate, no user collapse (the metric is
    // per-event); t and the Welch–Satterthwaite df are straight-line
    // doubles with sqrt (correctly rounded in both engines).
    Q("ab_welch", (s, d) => {
      tbl(s, d, "events")
        .select(pmod(col("user_id"), lit(2L)).as("arm"),
          col("value").cast("decimal(18,6)").as("v"))
        .groupBy()
        .agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 0, col("v")).otherwise(lit(0).cast("decimal(18,6)")))
            .cast("double").as("s10"),
          sum(when(col("arm") === 1, col("v")).otherwise(lit(0).cast("decimal(18,6)")))
            .cast("double").as("s11"),
          sum(when(col("arm") === 0, col("v") * col("v"))
            .otherwise(lit(0).cast("decimal(37,12)"))).cast("double").as("s20"),
          sum(when(col("arm") === 1, col("v") * col("v"))
            .otherwise(lit(0).cast("decimal(37,12)"))).cast("double").as("s21"))
        // try_divide throughout: an empty or single-user arm (n=0 or
        // n-1=0) yields NULL like the oracle's x/0, not an ANSI error;
        // every division keeps the oracle's exact operands, so non-
        // degenerate doubles stay bit-identical
        .withColumn("mean_diff",
          expr("try_divide(s10, n0) - try_divide(s11, n1)"))
        .withColumn("t_stat", expr(
          """try_divide(try_divide(s10, n0) - try_divide(s11, n1),
             sqrt(try_divide(try_divide(s20 - try_divide(s10*s10, n0), n0-1), n0) +
                  try_divide(try_divide(s21 - try_divide(s11*s11, n1), n1-1), n1)))"""))
        .withColumn("df_welch", expr(
          """try_divide(
             (try_divide(try_divide(s20 - try_divide(s10*s10, n0), n0-1), n0) + try_divide(try_divide(s21 - try_divide(s11*s11, n1), n1-1), n1))
             * (try_divide(try_divide(s20 - try_divide(s10*s10, n0), n0-1), n0) + try_divide(try_divide(s21 - try_divide(s11*s11, n1), n1-1), n1)),
             (try_divide(try_divide(try_divide(s20 - try_divide(s10*s10, n0), n0-1), n0) * try_divide(try_divide(s20 - try_divide(s10*s10, n0), n0-1), n0), n0-1)
                + try_divide(try_divide(try_divide(s21 - try_divide(s11*s11, n1), n1-1), n1) * try_divide(try_divide(s21 - try_divide(s11*s11, n1), n1-1), n1), n1-1)))"""))
        .select("n0", "n1", "s10", "s11", "s20", "s21",
          "mean_diff", "t_stat", "df_welch")
    }, Some("""
      WITH e AS (
        SELECT ((user_id % 2) + 2) % 2 AS arm, CAST(value AS DECIMAL(18,6)) AS v
        FROM events),
      g AS (
        SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN arm = 0 THEN v ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS s10,
               CAST(sum(CASE WHEN arm = 1 THEN v ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS s11,
               CAST(sum(CASE WHEN arm = 0 THEN v*v ELSE CAST(0 AS DECIMAL(36,12)) END) AS DOUBLE) AS s20,
               CAST(sum(CASE WHEN arm = 1 THEN v*v ELSE CAST(0 AS DECIMAL(36,12)) END) AS DOUBLE) AS s21
        FROM e)
      SELECT n0, n1, s10, s11, s20, s21,
             s10/n0 - s11/n1 AS mean_diff,
             (s10/n0 - s11/n1) /
             sqrt(((s20 - s10*s10/n0)/(n0-1))/n0 +
                  ((s21 - s11*s11/n1)/(n1-1))/n1) AS t_stat,
             (((s20 - s10*s10/n0)/(n0-1))/n0 + ((s21 - s11*s11/n1)/(n1-1))/n1)
             * (((s20 - s10*s10/n0)/(n0-1))/n0 + ((s21 - s11*s11/n1)/(n1-1))/n1)
             / ((((s20 - s10*s10/n0)/(n0-1))/n0) * (((s20 - s10*s10/n0)/(n0-1))/n0) / (n0-1)
                + (((s21 - s11*s11/n1)/(n1-1))/n1) * (((s21 - s11*s11/n1)/(n1-1))/n1) / (n1-1)) AS df_welch
      FROM g""")),

    // Experiment DESIGN, not analysis: Lehr's rule of thumb per event_type
    // — the sample size that powers a 2% relative lift at 80% power / 5%
    // two-sided alpha (n ≈ 16 σ²/Δ²) and the minimum detectable effect at
    // the arm size the data already has (Δ ≈ 4 σ/√n); both are unit-free
    // ratios, so the moments ride in exact integer MICROS. Float
    // discipline, one step past ab_welch's: the exact sums are DECIMALs of
    // SCALE 0 — a scale-12 decimal whose scaled integer exceeds 2^53 casts
    // to DOUBLE through two roundings in DuckDB (int128→double, then
    // ÷10¹²) and can land one ulp off Spark's correctly-rounded
    // BigDecimal conversion (observed on this very gate at sf0.01); at
    // scale 0 both engines make ONE correctly-rounded conversion.
    // try_divide so a 0/1-row type degenerates to NULL like the oracle's
    // x/0. The whole query is one grouped aggregate.
    Q("ab_power", (s, d) => {
      tbl(s, d, "events")
        .select(col("event_type"),
          expr("CAST(round(value * 1000000) AS BIGINT)").as("vm"))
        .groupBy("event_type")
        .agg(count(col("vm")).as("n"),
          sum(col("vm").cast("decimal(38,0)")).cast("double").as("s1"),
          sum(expr("CAST(vm AS DECIMAL(19,0)) * CAST(vm AS DECIMAL(19,0))"))
            .cast("double").as("s2"))
        .withColumn("mean", expr("try_divide(s1, n)"))
        .withColumn("variance",
          expr("try_divide(s2 - try_divide(s1*s1, n), n-1)"))
        .withColumn("n_for_2pct", expr(
          """CAST(ceil(try_divide(16 * try_divide(s2 - try_divide(s1*s1, n), n-1),
               (0.02 * try_divide(s1, n)) * (0.02 * try_divide(s1, n))))
             AS BIGINT)"""))
        .withColumn("mde_rel", expr(
          """try_divide(4 * sqrt(try_divide(
               try_divide(s2 - try_divide(s1*s1, n), n-1), n)),
             try_divide(s1, n))"""))
    }, Some("""
      WITH e AS (
        SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS vm
        FROM events),
      g AS (
        SELECT event_type, count(vm) AS n,
               CAST(sum(CAST(vm AS DECIMAL(38,0))) AS DOUBLE) AS s1,
               CAST(sum(CAST(vm AS DECIMAL(19,0)) * CAST(vm AS DECIMAL(19,0)))
                 AS DOUBLE) AS s2
        FROM e GROUP BY 1)
      SELECT event_type, n, s1, s2,
             s1/n AS mean,
             (s2 - s1*s1/n)/(n-1) AS variance,
             CAST(ceil(16 * ((s2 - s1*s1/n)/(n-1))
               / ((0.02 * (s1/n)) * (0.02 * (s1/n)))) AS BIGINT) AS n_for_2pct,
             4 * sqrt(((s2 - s1*s1/n)/(n-1))/n) / (s1/n) AS mde_rel
      FROM g""")),

    // Series autocorrelation — traffic periodicity detection: the event
    // log collapsed to a 5-minute count series (bounded by the TIME SPAN,
    // not the data volume — 30 days = 8640 points at any SF), then Pearson
    // r at lags 1..6 from exact integer sums over the lag-joined pairs.
    // Gapped buckets pair only when both endpoints exist (a join on
    // bucket+lag, not a positional window), so missing intervals never
    // fabricate zero samples. The series is aggregated BEFORE the
    // self-join, so the join touches KB regardless of input scale.
    Q("ts_autocorr", (s, d) => {
      // persisted (via releaseAfterAction): referenced as both join sides
      // — without it the event log would be scanned and aggregated twice
      // for one tiny series
      val series = tbl(s, d, "events")
        .filter(col("ts").isNotNull) // a time series has no NULL instant
        .groupBy(Q.tsBucket(col("ts"), 300000000L).as("bucket"))
        .agg(count(lit(1)).as("x"))
      val lagged = series
        .select(col("bucket"), col("x"),
          explode(sequence(lit(1L), lit(6L))).as("lag"))
        .withColumn("nb", col("bucket") + col("lag"))
      graft.Caching.releaseAfterAction(
        lagged.as("a")
          .join(broadcast(series).as("b"), col("a.nb") === col("b.bucket"))
          .groupBy(col("a.lag").as("lag"))
          .agg(count(lit(1)).as("np"),
            sum(col("a.x")).as("sx"), sum(col("b.x")).as("sy"),
            sum(col("a.x") * col("b.x")).as("sxy"),
            sum(col("a.x") * col("a.x")).as("sxx"),
            sum(col("b.x") * col("b.x")).as("syy"))
          // try_divide: a zero-variance lag group (tiny slices: every count
          // equal) yields NULL like DuckDB's DOUBLE x/0 — not an ANSI error
          .withColumn("r", expr(
            "try_divide(np*sxy - sx*sy, sqrt(np*sxx - sx*sx) * sqrt(np*syy - sy*sy))")),
        series)
    }, Some("""
      WITH srs AS (
        SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) AS bucket,
               count(*) AS x
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      p AS (
        SELECT l.lag, a.x AS ax, b.x AS bx
        FROM srs a
        JOIN (SELECT unnest(range(1, 7)) AS lag) l ON true
        JOIN srs b ON b.bucket = a.bucket + l.lag)
      SELECT lag, count(*) AS np,
             CAST(sum(ax) AS BIGINT) AS sx, CAST(sum(bx) AS BIGINT) AS sy,
             CAST(sum(ax*bx) AS BIGINT) AS sxy,
             CAST(sum(ax*ax) AS BIGINT) AS sxx,
             CAST(sum(bx*bx) AS BIGINT) AS syy,
             (count(*)*CAST(sum(ax*bx) AS BIGINT)
                - CAST(sum(ax) AS BIGINT)*CAST(sum(bx) AS BIGINT))
             / (sqrt(count(*)*CAST(sum(ax*ax) AS BIGINT)
                - CAST(sum(ax) AS BIGINT)*CAST(sum(ax) AS BIGINT))
                * sqrt(count(*)*CAST(sum(bx*bx) AS BIGINT)
                - CAST(sum(bx) AS BIGINT)*CAST(sum(bx) AS BIGINT))) AS r
      FROM p GROUP BY lag""")),

    // Change-point detection — the CUSUM-style level-shift locator, exact:
    // over the 5-minute count series (time-span-bounded, pre-aggregated),
    // the centered cumulative deviation at position t is carried as the
    // INTEGER cum_t·T − t·S (the ×T·S scaling clears both divisions), and
    // the change point is its |·|-argmax strictly before the series end.
    // Pre/post means around the break are the only float ops — single
    // divisions of exact ints. Windows run over the tiny series relation,
    // never the raw log.
    Q("ts_changepoint", (s, d) => {
      val wOrd = Window.orderBy("bucket")
      val series = tbl(s, d, "events")
        .filter(col("ts").isNotNull) // a time series has no NULL instant
        .groupBy(Q.tsBucket(col("ts"), 300000000L).as("bucket"))
        .agg(count(lit(1)).as("x"))
      val scored = series
        .withColumn("t", row_number().over(wOrd).cast("long"))
        .withColumn("cum", sum("x").over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tt", count(lit(1)).over(Window.partitionBy()))
        .withColumn("ss", sum("x").over(Window.partitionBy()))
        .withColumn("dev", expr("cum * tt - t * ss"))
        .filter(col("t") < col("tt"))
      scored
        .withColumn("rk", row_number().over(
          Window.orderBy(abs(col("dev")).desc, col("t").asc)))
        .filter(col("rk") === 1)
        .select(col("bucket"), col("t"), col("tt"), col("ss"), col("dev"),
          expr("cum / t").as("mean_pre"),
          expr("(ss - cum) / (tt - t)").as("mean_post"))
    }, Some("""
      WITH srs AS (
        SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) AS bucket,
               count(*) AS x
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      sc AS (
        SELECT bucket,
               row_number() OVER (ORDER BY bucket) AS t,
               CAST(sum(x) OVER (ORDER BY bucket
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(count(*) OVER () AS BIGINT) AS tt,
               CAST(sum(x) OVER () AS BIGINT) AS ss
        FROM srs),
      dv AS (
        SELECT *, cum * tt - t * ss AS dev FROM sc WHERE t < tt),
      rk AS (
        SELECT *, row_number() OVER (ORDER BY abs(dev) DESC, t ASC) AS rk
        FROM dv)
      SELECT bucket, t, tt, ss, dev,
             cum / t AS mean_pre, (ss - cum) / (tt - t) AS mean_post
      FROM rk WHERE rk = 1""")),

    // Per-entity exponential smoothing — the truncated 8-tap EWMA
    // (α = 1/2) of each user's value series at their LAST event: weights
    // are exact powers of two over exact decimals, so the numerator is an
    // exact decimal in both engines and the single final division is the
    // only float op. One user-partitioned window (bounded partitions),
    // emitted rows = one per user with ≥ 8 events.
    Q("ts_ewma", (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val vs = tbl(s, d, "events")
        .select(col("user_id"), Q.tsMicros(col("ts")).as("us"),
          col("event_id"), col("value").cast("decimal(18,6)").as("v"))
      val taps = (1 to 7).foldLeft(vs) { (df, i) =>
        df.withColumn(s"v$i", lag(col("v"), i).over(w))
      }
      taps
        .withColumn("rn",
          row_number().over(
            Window.partitionBy("user_id").orderBy(desc("us"), desc("event_id"))))
        .filter(col("rn") === 1 && col("v7").isNotNull)
        .withColumn("num", expr(
          "v*128 + v1*64 + v2*32 + v3*16 + v4*8 + v5*4 + v6*2 + v7"))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          (col("num").cast("double") / 255.0).as("ewma"))
    }, Some("""
      WITH o AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               CAST(value AS DECIMAL(18,6)) AS v,
               lag(CAST(value AS DECIMAL(18,6)), 1) OVER w AS v1,
               lag(CAST(value AS DECIMAL(18,6)), 2) OVER w AS v2,
               lag(CAST(value AS DECIMAL(18,6)), 3) OVER w AS v3,
               lag(CAST(value AS DECIMAL(18,6)), 4) OVER w AS v4,
               lag(CAST(value AS DECIMAL(18,6)), 5) OVER w AS v5,
               lag(CAST(value AS DECIMAL(18,6)), 6) OVER w AS v6,
               lag(CAST(value AS DECIMAL(18,6)), 7) OVER w AS v7,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
      SELECT user_id, event_id AS last_event_id,
             CAST(v*128 + v1*64 + v2*32 + v3*16 + v4*8 + v5*4 + v6*2 + v7
                  AS DOUBLE) / 255.0 AS ewma
      FROM o WHERE rn = 1 AND v7 IS NOT NULL""")),

    // Multi-touch attribution — conversion credit per channel under the
    // three classic models AT ONCE: for every purchase, its click/view
    // touches in the preceding 30 minutes (user-keyed join, range
    // predicate as residual — partitions bounded by per-user activity);
    // rank within each conversion gives first/last touch, and the linear
    // model's 1/k share is carried as an EXACT scaled integer
    // (1000000 div k), so the per-channel credit sums are pure BIGINTs.
    Q("sq_attribution", (s, d) => {
      val ev = tbl(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          Q.tsMicros(col("ts")).as("us"))
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("conv_id"),
          col("us").as("cus"))
      val touch = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_id").as("tid"),
          col("event_type").as("channel"), col("us").as("tus"))
      val wAsc = Window.partitionBy("conv_id").orderBy("tus", "tid")
      val wAll = Window.partitionBy("conv_id")
      conv.join(touch, Seq("user_id"))
        .filter(col("tus") >= col("cus") - 1800000000L && col("tus") < col("cus"))
        .withColumn("rn", row_number().over(wAsc))
        .withColumn("k", count(lit(1)).over(wAll))
        .groupBy("channel")
        .agg(count(lit(1)).as("touches"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("first_n"),
          sum(when(col("rn") === col("k"), 1L).otherwise(0L)).as("last_n"),
          sum(expr("1000000 div k")).as("linear_ppm"))
    }, Some("""
      WITH conv AS (
        SELECT user_id, event_id AS conv_id, epoch_us(ts) AS cus
        FROM events WHERE event_type = 'purchase'),
      touch AS (
        SELECT user_id, event_id AS tid, event_type AS channel,
               epoch_us(ts) AS tus
        FROM events WHERE event_type IN ('click', 'view')),
      j AS (
        SELECT t.channel, c.conv_id, t.tus, t.tid,
               row_number() OVER (PARTITION BY c.conv_id
                 ORDER BY t.tus, t.tid) AS rn,
               count(*) OVER (PARTITION BY c.conv_id) AS k
        FROM conv c JOIN touch t ON c.user_id = t.user_id
        WHERE t.tus >= c.cus - 1800000000 AND t.tus < c.cus)
      SELECT channel, count(*) AS touches,
             CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS first_n,
             CAST(sum(CASE WHEN rn = k THEN 1 ELSE 0 END) AS BIGINT) AS last_n,
             CAST(sum(1000000 // k) AS BIGINT) AS linear_ppm
      FROM j GROUP BY channel""")),

    // Time-to-convert quantiles — the funnel-latency companion to
    // q26_funnel: per purchase, the micros since the SAME user's most
    // recent preceding click (a running max over the user-partitioned
    // window — the as-of lookup without a join), then exact discrete
    // p50/p90 per purchase-day via the q21 rank-selection pattern. Pure
    // int64 end to end; the day partitioning keeps the quantile windows
    // bounded and parallel.
    Q("sq_funnel_time", (s, d) => {
      val wu = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // time-ordered analytics exclude un-timestamped events (the shared
      // sq_*/ts_* contract; oracles filter identically)
      val deltas = tbl(s, d, "events")
        .filter(col("ts").isNotNull)
        .select(col("user_id"), col("event_id"), col("event_type"),
          Q.tsMicros(col("ts")).as("us"))
        .withColumn("last_click_us",
          max(when(col("event_type") === "click", col("us"))).over(wu))
        .filter(col("event_type") === "purchase" && col("last_click_us").isNotNull)
        .select(expr("us div 86400000000").as("day"),
          (col("us") - col("last_click_us")).as("delta"), col("event_id"))
      val wd = Window.partitionBy("day").orderBy(col("delta").asc, col("event_id").asc)
      val ranked = deltas.withColumn("rn", row_number().over(wd))
      val sized = ranked.groupBy("day").agg(count(lit(1)).as("n_conv"))
      ranked.join(sized, "day")
        .groupBy(col("day"), col("n_conv"))
        .agg(
          max(when(col("rn") === ceil(col("n_conv") * 0.5), col("delta"))).as("p50_us"),
          max(when(col("rn") === ceil(col("n_conv") * 0.9), col("delta"))).as("p90_us"))
        .select("day", "n_conv", "p50_us", "p90_us")
    }, Some("""
      WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        FROM events WHERE ts IS NOT NULL),
      c AS (
        SELECT *, max(CASE WHEN event_type = 'click' THEN us END)
                 OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS last_click_us
        FROM e),
      dl AS (
        SELECT us // 86400000000 AS day, us - last_click_us AS delta, event_id
        FROM c WHERE event_type = 'purchase' AND last_click_us IS NOT NULL),
      r AS (
        SELECT day, delta,
               row_number() OVER (PARTITION BY day
                                  ORDER BY delta ASC, event_id ASC) AS rn,
               count(*) OVER (PARTITION BY day) AS n_conv
        FROM dl)
      SELECT day, n_conv,
             CAST(max(CASE WHEN rn = ceil(n_conv * 0.5) THEN delta END) AS BIGINT) AS p50_us,
             CAST(max(CASE WHEN rn = ceil(n_conv * 0.9) THEN delta END) AS BIGINT) AS p90_us
      FROM r GROUP BY day, n_conv""")),

    // PMI collocations — corpus-level phrase mining: bigram and unigram
    // counts from the shared whitespace tokenizer, scored by pointwise
    // mutual information carried as the exact-ratio components
    // (n_xy·N, n_x·n_y) plus the single-division lift (log-free: log is
    // monotonic, so the lift ranking IS the PMI ranking, without relying
    // on cross-engine libm bits). Two token-keyed hash aggregates and two
    // broadcast-sized joins against the unigram table; min-count 5 prunes
    // the hapax tail before the join.
    Q("tx_collocations", (s, d) => {
      // one corpus scan: the tokenized projection is persisted (via
      // releaseAfterAction) and feeds bigram counts, unigram counts, and
      // the bigram total; the unigram table is persisted too (it is both
      // broadcast join sides)
      val toks = Q.spreadSmallScan(tbl(s, d, "documents"))
        .select(split(col("text"), " ").as("w"))
      val bigrams = toks.filter(size(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(w) - 2), i -> named_struct('w1', w[i], 'w2', w[i+1]))"))
          .as("b"))
        .select(col("b.w1"), col("b.w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("n_xy"))
        .filter(col("n_xy") >= 5)
      val uni = toks.select(explode(col("w")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n_w"))
      val nTot = toks.select((size(col("w")) - 1).cast("long").as("nb"))
        .agg(sum("nb").as("n_big"))
      graft.Caching.releaseAfterAction(
        bigrams
          .join(broadcast(uni.withColumnRenamed("word", "w1")
            .withColumnRenamed("n_w", "n_x")), "w1")
          .join(broadcast(uni.withColumnRenamed("word", "w2")
            .withColumnRenamed("n_w", "n_y")), "w2")
          .crossJoin(broadcast(nTot))
          // widen the products through decimal(38,0) / HUGEINT before the
          // double division: bigint·bigint wraps silently in Spark but
          // raises in DuckDB, so at large scale the two engines would
          // diverge asymmetrically; 38 digits holds any int64² exactly
          .withColumn("lift", expr(
            "CAST(CAST(n_xy AS DECIMAL(38,0)) * n_big AS DOUBLE) / " +
              "CAST(CAST(n_x AS DECIMAL(38,0)) * n_y AS DOUBLE)"))
          .orderBy(desc("lift"), col("w1"), col("w2"))
          .limit(50)
          .select("w1", "w2", "n_xy", "n_x", "n_y", "n_big", "lift"),
        toks, uni)
    }, Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      bg AS (
        SELECT unnest(list_transform(range(1, len(l)),
                 i -> struct_pack(w1 := l[i], w2 := l[i + 1]))) AS s
        FROM t WHERE len(l) >= 2),
      b AS (SELECT s.w1 AS w1, s.w2 AS w2, count(*) AS n_xy FROM bg
            GROUP BY 1, 2 HAVING count(*) >= 5),
      u AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      uc AS (SELECT word, count(*) AS n_w FROM u GROUP BY 1),
      tot AS (SELECT CAST(sum(len(l) - 1) AS BIGINT) AS n_big FROM t)
      SELECT b.w1, b.w2, b.n_xy, x.n_w AS n_x, y.n_w AS n_y, tot.n_big,
             CAST(b.n_xy * CAST(tot.n_big AS HUGEINT) AS DOUBLE) /
               CAST(x.n_w * CAST(y.n_w AS HUGEINT) AS DOUBLE) AS lift
      FROM b JOIN uc x ON b.w1 = x.word JOIN uc y ON b.w2 = y.word
      CROSS JOIN tot
      ORDER BY lift DESC, b.w1, b.w2 LIMIT 50""")),

    // CUPED variance reduction — the pre-experiment-covariate adjustment
    // every mature experimentation platform applies: per user, the
    // pre-period value total (first 15 days) predicts the post-period
    // metric, and θ = cov(x,y)/var(x) strips the predictable component.
    // Per-user totals are EXACT micro-scaled BIGINTs (the q32 house
    // pattern), truncated to millis by integer division so the second
    // moments (Σxy, Σxx, Σyy over ~2e6-sized values) stay inside int64 —
    // θ, the adjusted per-arm means, and the variance-reduction ratio are
    // then straight-line doubles over those exact sums. One user
    // collapse, one 1-row fold; no joins.
    Q("ab_cuped", (s, d) => {
      val cut = 1705363200000000L // 2024-01-16T00:00:00Z
      val users = tbl(s, d, "events")
        .select(col("user_id"), Q.tsMicros(col("ts")).as("us"),
          expr("CAST(round(value * 1000000) AS BIGINT)").as("vm"))
        .groupBy("user_id")
        .agg(
          sum(when(col("us") < cut, col("vm")).otherwise(0L)).as("xm"),
          sum(when(col("us") >= cut, col("vm")).otherwise(0L)).as("ym"))
        .select(col("user_id"),
          expr("xm div 1000").as("x"), expr("ym div 1000").as("y"),
          pmod(col("user_id"), lit(2L)).as("arm"))
      users.groupBy()
        .agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"),
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("arm") === 0, col("x")).otherwise(0L)).as("sx0"),
          sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("sy0"),
          sum(when(col("arm") === 1, col("x")).otherwise(0L)).as("sx1"),
          sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("sy1"))
        // try_divide: zero pre-metric variance -> NULL theta (DuckDB parity)
        .withColumn("theta", expr("try_divide(n*sxy - sx*sy, n*sxx - sx*sx)"))
        // try_divide mirrors the oracle's x/0 -> NULL on an empty arm
        // (n0 = 0 or n = n0) and zero variance; operands unchanged
        .withColumn("adj_diff", expr(
          """(try_divide(sy0, n0) - try_divide(n*sxy - sx*sy, n*sxx - sx*sx)*(try_divide(sx0, n0) - try_divide(sx, n)))
             - (try_divide(sy1, n-n0) - try_divide(n*sxy - sx*sy, n*sxx - sx*sx)*(try_divide(sx1, n-n0) - try_divide(sx, n)))"""))
        .withColumn("var_reduction", expr(
          """try_divide(try_divide(n*sxy - sx*sy, n*sxx - sx*sx) * try_divide(n*sxy - sx*sy, n*sxx - sx*sx)
             * (n*sxx - sx*sx), n*syy - sy*sy)"""))
        .select("n", "n0", "sx", "sy", "sxx", "sxy", "syy",
          "theta", "adj_diff", "var_reduction")
    }, Some("""
      WITH u AS (
        SELECT user_id, ((user_id % 2) + 2) % 2 AS arm,
               CAST(sum(CASE WHEN epoch_us(ts) < 1705363200000000
                 THEN CAST(round(value * 1000000) AS BIGINT) ELSE 0 END)
                 AS BIGINT) // 1000 AS x,
               CAST(sum(CASE WHEN epoch_us(ts) >= 1705363200000000
                 THEN CAST(round(value * 1000000) AS BIGINT) ELSE 0 END)
                 AS BIGINT) // 1000 AS y
        FROM events GROUP BY 1, 2),
      g AS (
        SELECT count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x*x) AS BIGINT) AS sxx,
               CAST(sum(x*y) AS BIGINT) AS sxy,
               CAST(sum(y*y) AS BIGINT) AS syy,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS sx0,
               CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sy0,
               CAST(sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS sx1,
               CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1
        FROM u)
      SELECT n, n0, sx, sy, sxx, sxy, syy,
             (n*sxy - sx*sy) / (n*sxx - sx*sx) AS theta,
             (sy0/n0 - ((n*sxy - sx*sy) / (n*sxx - sx*sx))*(sx0/n0 - sx/n))
             - (sy1/(n-n0) - ((n*sxy - sx*sy) / (n*sxx - sx*sx))*(sx1/(n-n0) - sx/n)) AS adj_diff,
             ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * ((n*sxy - sx*sy) / (n*sxx - sx*sx))
             * (n*sxx - sx*sx) / (n*syy - sy*sy) AS var_reduction
      FROM g""")),

    // Forecast backtest — seasonal-naive prediction scored by WAPE, the
    // workhorse accuracy check of a demand/traffic forecasting pipeline:
    // each hourly per-type count is predicted by the same hour one week
    // earlier (and, as the naive baseline, one day earlier); the weighted
    // absolute percentage error keeps the exact integer numerator
    // (Σ|actual − predicted|) and denominator (Σ actual) and crosses into
    // float only in the final single division. The series is aggregated
    // before the lag joins, so both joins touch a time-span-bounded
    // relation (720 hours) regardless of event volume.
    Q("ts_backtest", (s, d) => {
      // persisted (via releaseAfterAction): the series feeds both sides
      // of both lag joins — four references, which would otherwise be
      // four full event-log scans
      val srs = tbl(s, d, "events")
        .groupBy(col("event_type"), Q.tsBucket(col("ts"), 3600000000L).as("b"))
        .agg(count(lit(1)).as("x"))
      def scored(lagH: Int, err: String, act: String) = srs.as("a")
        .join(broadcast(srs).as("p"),
          col("a.event_type") === col("p.event_type") &&
            col("p.b") === col("a.b") - lagH)
        .groupBy(col("a.event_type").as("event_type"))
        .agg(sum(abs(col("a.x") - col("p.x"))).as(err),
          sum(col("a.x")).as(act))
      graft.Caching.releaseAfterAction(
        scored(168, "err_w", "act_w")
          .join(scored(24, "err_d", "act_d"), "event_type")
          .withColumn("wape_weekly", expr("err_w / act_w"))
          .withColumn("wape_daily", expr("err_d / act_d")),
        srs)
    }, Some("""
      WITH s AS (
        SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS b,
               count(*) AS x
        FROM events GROUP BY 1, 2),
      w AS (
        SELECT a.event_type,
               CAST(sum(abs(a.x - p.x)) AS BIGINT) AS err_w,
               CAST(sum(a.x) AS BIGINT) AS act_w
        FROM s a JOIN s p ON a.event_type = p.event_type
                         AND p.b = a.b - 168
        GROUP BY 1),
      dly AS (
        SELECT a.event_type,
               CAST(sum(abs(a.x - p.x)) AS BIGINT) AS err_d,
               CAST(sum(a.x) AS BIGINT) AS act_d
        FROM s a JOIN s p ON a.event_type = p.event_type
                         AND p.b = a.b - 24
        GROUP BY 1)
      SELECT w.event_type, err_w, act_w, err_d, act_d,
             err_w / act_w AS wape_weekly, err_d / act_d AS wape_daily
      FROM w JOIN dly ON w.event_type = dly.event_type""")),

    // Key-skew diagnostic — the pre-join audit that decides whether a
    // 100 TB join needs salting or AQE skew handling: the per-key row
    // counts collapsed into a log2 frequency histogram (floor(log2 n) via
    // binary-string length — exact in both engines, no libm), with the
    // concentration statistics every skew decision reads: the hottest
    // key's share and the Herfindahl–Hirschman numerator Σnᵢ² (exact
    // BIGINTs; the shares are single divisions). Key collapse is the only
    // data-sized shuffle; the histogram and the 1-row fold are keys-sized.
    Q("dq_skew", (s, d) => {
      // the global concentration stats fold FROM the histogram (every one
      // is bucket-decomposable, including Σnᵢ² carried as hhi_in), so the
      // event log is scanned exactly once and everything past the key
      // collapse is keys- then buckets-sized
      val hist = tbl(s, d, "events")
        .groupBy("user_id").agg(count(lit(1)).as("n_i"))
        .groupBy((length(bin(col("n_i"))) - 1).cast("long").as("log2_n"))
        .agg(count(lit(1)).as("n_keys"),
          min("n_i").as("min_n"), max("n_i").as("max_n"),
          sum("n_i").as("rows_in"),
          sum(col("n_i") * col("n_i")).as("hhi_in"))
      // persisted via releaseAfterAction: folded into glob AND emitted —
      // one key collapse
      val glob = hist.groupBy()
        .agg(sum("n_keys").as("tot_keys"), sum("rows_in").as("tot_rows"),
          max("max_n").as("hot_n"), sum("hhi_in").as("hhi_num"))
        .withColumn("top1_share", expr("hot_n / tot_rows"))
        .withColumn("hhi", expr("hhi_num / (tot_rows * tot_rows)"))
      graft.Caching.releaseAfterAction(hist.crossJoin(broadcast(glob)), hist)
    }, Some("""
      WITH k AS (SELECT user_id, count(*) AS n_i FROM events GROUP BY 1),
      h AS (
        SELECT CAST(length(bin(n_i)) - 1 AS BIGINT) AS log2_n,
               count(*) AS n_keys, min(n_i) AS min_n, max(n_i) AS max_n,
               CAST(sum(n_i) AS BIGINT) AS rows_in,
               CAST(sum(n_i*n_i) AS BIGINT) AS hhi_in
        FROM k GROUP BY 1),
      g AS (
        SELECT CAST(sum(n_keys) AS BIGINT) AS tot_keys,
               CAST(sum(rows_in) AS BIGINT) AS tot_rows,
               max(max_n) AS hot_n, CAST(sum(hhi_in) AS BIGINT) AS hhi_num
        FROM h)
      SELECT h.*, g.tot_keys, g.tot_rows, g.hot_n, g.hhi_num,
             g.hot_n / g.tot_rows AS top1_share,
             g.hhi_num / (g.tot_rows * g.tot_rows) AS hhi
      FROM h CROSS JOIN g""")),

    // l-diversity audit — the companion to dq_kanon: a k-anonymous class
    // is still re-identifiable if its SENSITIVE attribute is uniform, so
    // the audit reports, per quasi-identifier class (user × day — finer
    // than dq_kanon's decade classes, where every class carries all five
    // types and the audit would be vacuous), the class size and the
    // number of distinct event types, flagging classes below l = 3. One
    // hash aggregate; count(distinct) is a two-phase partial aggregate
    // at scale.
    Q("dq_ldiv", (s, d) => {
      tbl(s, d, "events")
        .groupBy(col("user_id"),
          Q.tsBucket(col("ts"), 86400000000L).as("day"))
        .agg(count(lit(1)).as("class_size"),
          countDistinct(col("event_type")).as("l_div"))
        .filter(col("l_div") < 3)
    }, Some("""
      SELECT user_id,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             count(*) AS class_size,
             count(DISTINCT event_type) AS l_div
      FROM events GROUP BY 1, 2 HAVING count(DISTINCT event_type) < 3""")),

    // Sample-ratio mismatch — the assignment-health guardrail every
    // experiment platform runs BEFORE reading any metric: the splitter
    // (two md5 nibbles of the user id, mod 3 — a hash both engines replay
    // byte-for-byte) should land users on arms in thirds; the chi-square
    // against the uniform expectation is a straight-line double over the
    // three exact BIGINT arm counts, spliced from the same text into both
    // engines. The flag compares that bit-identical double to the df=2
    // p≈1e-3 critical value. One user collapse (the minimal shuffle the
    // user-level unit demands) + a 1-row conditional fold.
    Q("ab_srm", (s, d) => {
      tbl(s, d, "events")
        .select(col("user_id")).distinct()
        .select(expr(
          "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 2), 16, 10) AS BIGINT) % 3")
          .as("arm"))
        .groupBy()
        .agg(count(lit(1)).as("nt"),
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("k0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("k1"),
          sum(when(col("arm") === 2, 1L).otherwise(0L)).as("k2"))
        .withColumn("chisq", expr(SRM_EXPR))
        // CASE-shaped, not a bare cast: a NULL chisq (empty slice) must flag
        // 0 like the oracle's CASE WHEN, not propagate NULL
        .withColumn("srm_flag",
          when(col("chisq") > 13.8155, 1L).otherwise(0L))
    }, Some(s"""
      WITH u AS (
        SELECT (instr('0123456789abcdef',
                      substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (instr('0123456789abcdef',
                        substr(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 1) AS h
        FROM (SELECT DISTINCT user_id FROM events)),
      g AS (
        SELECT count(*) AS nt,
               CAST(sum(CASE WHEN h % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS k0,
               CAST(sum(CASE WHEN h % 3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS k1,
               CAST(sum(CASE WHEN h % 3 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS k2
        FROM u)
      SELECT nt, k0, k1, k2, $SRM_EXPR AS chisq,
             CAST(CASE WHEN $SRM_EXPR > 13.8155 THEN 1 ELSE 0 END AS BIGINT)
               AS srm_flag
      FROM g""")),

    // Classical seasonal decomposition — the STL-shaped additive split of
    // the hourly traffic series into trend + hour-of-day seasonality +
    // residual: trend is a centered 24-tap moving average (exact BIGINT
    // window sums over the PRE-AGGREGATED series — bounded by the 720-hour
    // time span, never the event volume), the seasonal index is each
    // hour-of-day's mean deviation from the grand mean, and the residual
    // is what neither explains. Every emitted float is a straight-line
    // formula over exact integer sums, spliced from shared text; the
    // per-hour means and the grand mean ride along as their exact
    // numerator/denominator pairs.
    Q("ts_decompose", (s, d) => {
      // persisted via releaseAfterAction — three references: trend
      // window, hod means, grand fold
      val srs = tbl(s, d, "events")
        .filter(col("ts").isNotNull) // a time series has no NULL instant
        .groupBy(Q.tsBucket(col("ts"), 3600000000L).as("b"))
        .agg(count(lit(1)).as("x"))
      val wTrend = Window.orderBy("b").rowsBetween(-12, 11)
      val hod = srs.groupBy(pmod(col("b"), lit(24L)).as("hod"))
        .agg(sum("x").as("sn"), count(lit(1)).as("sc"))
      val glob = srs.groupBy()
        .agg(sum("x").as("gs"), count(lit(1)).as("gn"))
      graft.Caching.releaseAfterAction(
        srs
          .withColumn("tn", sum("x").over(wTrend))
          .withColumn("tc", count(lit(1)).over(wTrend))
          .withColumn("hod", pmod(col("b"), lit(24L)))
          .join(broadcast(hod), "hod")
          .crossJoin(broadcast(glob))
          .withColumn("trend", expr(TREND_EXPR))
          .withColumn("seasonal", expr(SEAS_EXPR))
          .withColumn("resid", expr(RESID_EXPR))
          .select("b", "x", "hod", "tn", "tc", "sn", "sc", "gs", "gn",
            "trend", "seasonal", "resid"),
        srs)
    }, Some(s"""
      WITH srs AS (
        SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS b, count(*) AS x
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      tr AS (
        SELECT b, x, b % 24 AS hod,
               CAST(sum(x) OVER w AS BIGINT) AS tn,
               CAST(count(*) OVER w AS BIGINT) AS tc
        FROM srs
        WINDOW w AS (ORDER BY b ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)),
      hd AS (
        SELECT b % 24 AS hod, CAST(sum(x) AS BIGINT) AS sn,
               count(*) AS sc
        FROM srs GROUP BY 1),
      g AS (
        SELECT CAST(sum(x) AS BIGINT) AS gs, count(*) AS gn FROM srs)
      SELECT b, x, tr.hod, tn, tc, sn, sc, gs, gn,
             $TREND_EXPR AS trend, $SEAS_EXPR AS seasonal,
             $RESID_EXPR AS resid
      FROM tr JOIN hd ON tr.hod = hd.hod CROSS JOIN g""")),

    // Robust anomaly detection — median/MAD outlier flags on the hourly
    // count series, FULLY integer: both the median and the MAD are exact
    // discrete rank selections (the q21 pattern — lower median at rank
    // (N+1) div 2 with the bucket id as tiebreak, identical in both
    // engines, no interpolation ambiguity), and the 3-MAD fence is an
    // integer comparison — the gate never touches a float. Both selections
    // window over the tiny pre-aggregated series; the scalars fold back in
    // as broadcast 1-row relations (the house scalar pattern).
    Q("ts_anomaly", (s, d) => {
      // both persisted via releaseAfterAction: srs is referenced by the N
      // fold, the median rank, and dv; dv by the MAD rank and the filter
      val srs = tbl(s, d, "events")
        .filter(col("ts").isNotNull) // a time series has no NULL instant
        .groupBy(Q.tsBucket(col("ts"), 3600000000L).as("b"))
        .agg(count(lit(1)).as("x"))
      val n = srs.groupBy().agg(count(lit(1)).as("nn"))
      val med = srs
        .withColumn("rn", row_number().over(Window.orderBy("x", "b")))
        .crossJoin(broadcast(n))
        .filter(col("rn") === expr("(nn + 1) div 2"))
        .select(col("x").as("med"))
      val dv = srs.crossJoin(broadcast(med))
        .withColumn("dev", abs(col("x") - col("med")))
      val mad = dv
        .withColumn("rn", row_number().over(Window.orderBy("dev", "b")))
        .crossJoin(broadcast(n))
        .filter(col("rn") === expr("(nn + 1) div 2"))
        .select(col("dev").as("mad"))
      graft.Caching.releaseAfterAction(
        dv.crossJoin(broadcast(mad))
          .filter(col("dev") > lit(3L) * col("mad"))
          .select("b", "x", "med", "mad", "dev"),
        srs, dv)
    }, Some("""
      WITH srs AS (
        SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS b, count(*) AS x
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      n AS (SELECT count(*) AS nn FROM srs),
      med AS (
        SELECT x AS med FROM
          (SELECT x, row_number() OVER (ORDER BY x, b) AS rn FROM srs), n
        WHERE rn = (nn + 1) // 2),
      dv AS (
        SELECT b, x, med, abs(x - med) AS dev FROM srs, med),
      mad AS (
        SELECT dev AS mad FROM
          (SELECT dev, b, row_number() OVER (ORDER BY dev, b) AS rn FROM dv), n
        WHERE rn = (nn + 1) // 2)
      SELECT b, x, med, mad, dev FROM dv, mad WHERE dev > 3 * mad""")),

    // Lead-lag cross-correlation — ts_autocorr's two-series sibling, the
    // question a growth team actually asks ("do clicks LEAD purchases,
    // and by how much?"): Pearson r between the click and purchase
    // 5-minute count series at purchase lags −6..+6. Pairs come from a
    // bucket+lag equi-join of the two pre-aggregated series (both
    // time-span-bounded; the click side broadcast), so gaps never
    // fabricate zeros; all moments are exact BIGINTs and r is the same
    // shared-text formula autocorr uses. The argmax-lag readout is the
    // lead-lag estimate.
    Q("ts_xcorr", (s, d) => {
      def srs(et: String, xn: String) = tbl(s, d, "events")
        .filter(col("event_type") === et)
        .groupBy(Q.tsBucket(col("ts"), 300000000L).as("bucket"))
        .agg(count(lit(1)).as(xn))
      val lagged = srs("click", "x")
        .select(col("bucket"), col("x"),
          explode(sequence(lit(-6L), lit(6L))).as("lag"))
        .withColumn("nb", col("bucket") + col("lag"))
      lagged.as("a")
        .join(broadcast(srs("purchase", "y")).as("b"),
          col("a.nb") === col("b.bucket"))
        .groupBy(col("a.lag").as("lag"))
        .agg(count(lit(1)).as("np"),
          sum(col("a.x")).as("sx"), sum(col("b.y")).as("sy"),
          sum(col("a.x") * col("b.y")).as("sxy"),
          sum(col("a.x") * col("a.x")).as("sxx"),
          sum(col("b.y") * col("b.y")).as("syy"))
        // try_divide: zero-variance lag group -> NULL (DuckDB DOUBLE x/0
        // parity), not an ANSI divide-by-zero error at tiny slice sizes
        .withColumn("r", expr(
          "try_divide(np*sxy - sx*sy, sqrt(np*sxx - sx*sx) * sqrt(np*syy - sy*sy))"))
    }, Some("""
      WITH c AS (
        SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) AS bucket,
               count(*) AS x
        FROM events WHERE event_type = 'click' GROUP BY 1),
      p AS (
        SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) AS bucket,
               count(*) AS y
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      pr AS (
        SELECT l.lag, a.x AS x, b.y AS y
        FROM c a
        JOIN (SELECT unnest(range(-6, 7)) AS lag) l ON true
        JOIN p b ON b.bucket = a.bucket + l.lag)
      SELECT lag, count(*) AS np,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x*y) AS BIGINT) AS sxy,
             CAST(sum(x*x) AS BIGINT) AS sxx,
             CAST(sum(y*y) AS BIGINT) AS syy,
             (count(*)*CAST(sum(x*y) AS BIGINT)
                - CAST(sum(x) AS BIGINT)*CAST(sum(y) AS BIGINT))
             / (sqrt(count(*)*CAST(sum(x*x) AS BIGINT)
                - CAST(sum(x) AS BIGINT)*CAST(sum(x) AS BIGINT))
                * sqrt(count(*)*CAST(sum(y*y) AS BIGINT)
                - CAST(sum(y) AS BIGINT)*CAST(sum(y) AS BIGINT))) AS r
      FROM pr GROUP BY lag""")),

    // Deterministic half-sample uncertainty — the resampling CI without
    // the nondeterminism: 32 half-samples, membership of row r in sample
    // b decided by the b-th hex nibble of ONE md5 of the event id (both
    // engines replay the hash byte-for-byte; a 128-bit digest carries all
    // 32 membership bits, so the scan hashes each row ONCE instead of
    // once per sample — 32× less hashing, the difference that matters at
    // 100 TB), each sample's mean an exact micro-sum over an exact count,
    // and the spread read off a rank over the 32 bit-identical means. The
    // per-sample fan-out is a generator inside the scan (map-side
    // combinable 32-way partial aggregate) — ONE pass over the log
    // regardless of B; this is how a 100 TB pipeline prices "how sure are
    // we" without a second job.
    Q("ab_halfsample_ci", (s, d) => {
      val means = tbl(s, d, "events")
        .select(
          expr("CAST(round(value * 1000000) AS BIGINT)").as("qv"),
          md5(col("event_id").cast("string")).as("h"))
        .select(col("qv"), col("h"),
          explode(sequence(lit(0L), lit(31L))).as("b"))
        .filter(expr(
          """CAST(conv(substr(h, CAST(b + 1 AS INT), 1), 16, 10)
              AS BIGINT) % 2 = 0"""))
        .groupBy("b")
        .agg(count(lit(1)).as("n_b"), sum("qv").as("sum_qv"))
        .withColumn("mean_b", expr("sum_qv / n_b"))
      means.withColumn("rk",
        row_number().over(Window.orderBy(col("mean_b"), col("b"))).cast("long"))
    }, Some("""
      WITH f AS (
        SELECT CAST(round(e.value * 1000000) AS BIGINT) AS qv,
               md5(CAST(e.event_id AS VARCHAR)) AS h, b.b
        FROM events e, (SELECT unnest(range(0, 32)) AS b) b),
      m AS (
        SELECT qv, b FROM f
        WHERE (instr('0123456789abcdef',
                 substr(h, CAST(b + 1 AS INT), 1)) - 1) % 2 = 0),
      g AS (
        SELECT b, count(*) AS n_b, CAST(sum(qv) AS BIGINT) AS sum_qv
        FROM m GROUP BY 1)
      SELECT b, n_b, sum_qv, sum_qv / n_b AS mean_b,
             row_number() OVER (ORDER BY sum_qv / n_b, b) AS rk
      FROM g""")),

    // DAU/MAU stickiness — the headline engagement ratio: daily actives
    // over trailing-30-day actives, EXACT. The rolling distinct that
    // makes MAU expensive is turned into an equi-shape: each user-day
    // contributes the user to the 30 following days' windows (a bounded
    // generator fan-out over the ALREADY-COLLAPSED user-day relation —
    // ×30 of a distinct relation, not of the log), deduped per (user,
    // window-day) and counted. Both counts are exact; the ratio is the
    // single division. Days are reported where DAU exists (early windows
    // are partial by definition, as every MAU series is).
    Q("sq_stickiness", (s, d) => {
      val uw = tbl(s, d, "events")
        .filter(col("ts").isNotNull) // time-ordered contract (see sq_funnel_time)
        .select(col("user_id"),
          Q.tsBucket(col("ts"), 86400000000L).as("day"))
        .distinct()
      val dau = uw.groupBy("day").agg(count(lit(1)).as("dau"))
      val mau = uw
        .select(col("user_id"),
          explode(expr("sequence(day, day + 29)")).as("md"))
        .distinct()
        .groupBy(col("md").as("day")).agg(count(lit(1)).as("mau"))
      graft.Caching.releaseAfterAction(
        dau.join(mau, "day")
          .withColumn("stickiness", expr("dau / mau")),
        uw)
    }, Some("""
      WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
        FROM events WHERE ts IS NOT NULL),
      dau AS (SELECT day, count(*) AS dau FROM uw GROUP BY 1),
      mau AS (
        SELECT md AS day, count(*) AS mau FROM (
          SELECT DISTINCT user_id, unnest(range(day, day + 30)) AS md
          FROM uw)
        GROUP BY 1)
      SELECT dau.day, dau.dau, mau.mau, dau.dau / mau.mau AS stickiness
      FROM dau JOIN mau ON dau.day = mau.day""")),

    // Market-basket lift — the transactional sibling of tx_collocations:
    // part pairs co-purchased in the same order, scored by lift carried
    // as its exact integer components (co·N, n_a·n_b) plus the single
    // division. Pair generation is a self-join ON THE ORDER KEY, so
    // fan-out is bounded by lines-per-order (≤ 7 here) — the blocking
    // that keeps basket mining linear in orders at any scale; the
    // per-part frequency joins are key-partitioned and the order total
    // is a broadcast 1-row fold. Support threshold co ≥ 3 prunes the
    // pair tail before the frequency joins.
    Q("sq_basket_lift", (s, d) => {
      val li = tbl(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val pairs = li.as("a").join(li.as("b"),
          expr("a.ok = b.ok AND a.pk < b.pk"))
        .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
        .agg(count(lit(1)).as("co"))
        .filter(col("co") >= 3)
      val freq = li.groupBy("pk").agg(count(lit(1)).as("n"))
      val nOrders = li.select("ok").distinct()
        .groupBy().agg(count(lit(1)).as("n_orders"))
      graft.Caching.releaseAfterAction(
        pairs
          .join(freq.select(col("pk").as("pa"), col("n").as("n_a")), "pa")
          .join(freq.select(col("pk").as("pb"), col("n").as("n_b")), "pb")
          .crossJoin(broadcast(nOrders))
          // decimal-widened products, same rationale as tx_collocations:
          // Spark wraps int64 overflow silently where DuckDB raises
          .withColumn("lift", expr(
            "CAST(CAST(co AS DECIMAL(38,0)) * n_orders AS DOUBLE) / " +
              "CAST(CAST(n_a AS DECIMAL(38,0)) * n_b AS DOUBLE)")),
        li)
    }, Some("""
      WITH li AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      p AS (
        SELECT a.pk AS pa, b.pk AS pb, count(*) AS co
        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY 1, 2 HAVING count(*) >= 3),
      f AS (SELECT pk, count(*) AS n FROM li GROUP BY 1),
      t AS (SELECT count(DISTINCT ok) AS n_orders FROM li)
      SELECT pa, pb, co, fa.n AS n_a, fb.n AS n_b, t.n_orders,
             CAST(co * CAST(t.n_orders AS HUGEINT) AS DOUBLE) /
               CAST(fa.n * CAST(fb.n AS HUGEINT) AS DOUBLE) AS lift
      FROM p JOIN f fa ON p.pa = fa.pk JOIN f fb ON p.pb = fb.pk
      CROSS JOIN t""")),

    // Cohort LTV — the revenue companion to q28's retention matrix: per
    // (first-seen-day cohort, day age), distinct actives and exact
    // micro-revenue, with the running cumulative revenue each LTV curve
    // plots riding as a cohort-partitioned window over the tiny
    // (cohort × age) aggregate — never over the raw log. One user
    // collapse for the cohort map, one user-keyed join back, one hash
    // aggregate; all integers.
    Q("sq_cohort_ltv", (s, d) => {
      val ev = tbl(s, d, "events")
        .filter(col("ts").isNotNull) // time-ordered contract (see sq_funnel_time)
        .select(col("user_id"), Q.tsBucket(col("ts"), 86400000000L).as("day"),
          expr("CAST(round(value * 1000000) AS BIGINT)").as("qv"))
      val first = ev.groupBy("user_id").agg(min("day").as("cohort"))
      ev.join(first, "user_id")
        .groupBy(col("cohort"), (col("day") - col("cohort")).as("age"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          sum("qv").as("rev"))
        .withColumn("cum_rev", sum("rev").over(
          Window.partitionBy("cohort").orderBy("age")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    }, Some("""
      WITH ev AS (
        SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(round(value * 1000000) AS BIGINT) AS qv
        FROM events WHERE ts IS NOT NULL),
      f AS (SELECT user_id, min(day) AS cohort FROM ev GROUP BY 1),
      g AS (
        SELECT f.cohort, ev.day - f.cohort AS age,
               count(DISTINCT ev.user_id) AS n_users,
               CAST(sum(ev.qv) AS BIGINT) AS rev
        FROM ev JOIN f ON ev.user_id = f.user_id
        GROUP BY 1, 2)
      SELECT cohort, age, n_users, rev,
             CAST(sum(rev) OVER (PARTITION BY cohort ORDER BY age
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_rev
      FROM g""")),

    // Growth accounting — the DAILY user-lifecycle ledger (new /
    // retained / resurrected / churned) every growth team reads first:
    // user-days collapse to a distinct relation (the one data-sized
    // shuffle), a per-user lag/lead window classifies each active day,
    // and churn posts to the FOLLOWING day (bounded by the corpus span
    // via a broadcast max-day fold, so the ledger never invents a day
    // after the data ends). The growth identities — active = new +
    // retained + resurrected, churned(d) = active(d−1) − retained(d) —
    // are spec-asserted; all counts exact.
    Q("sq_lifecycle", (s, d) => {
      val wk = Window.partitionBy("user_id").orderBy("day")
      val uw = tbl(s, d, "events")
        .filter(col("ts").isNotNull) // time-ordered contract (see sq_funnel_time)
        .select(col("user_id"),
          Q.tsBucket(col("ts"), 86400000000L).as("day"))
        .distinct()
      // feeds both the active and churn branches; cached via the
      // release-after-action dep below
      val base = uw
        .withColumn("prevw", lag("day", 1).over(wk))
        .withColumn("nextw", lead("day", 1).over(wk))
      val maxw = uw.groupBy().agg(max("day").as("maxday"))
      val actives = base.select(col("day"),
        when(col("prevw").isNull, "new")
          .when(col("prevw") === col("day") - 1, "retained")
          .otherwise("resurrected").as("state"))
      val churned = base
        .filter(col("nextw").isNull || col("nextw") > col("day") + 1)
        .crossJoin(broadcast(maxw))
        .filter(col("day") + 1 <= col("maxday"))
        .select((col("day") + 1).as("day"), lit("churned").as("state"))
      graft.Caching.releaseAfterAction(
        actives.unionByName(churned)
          .groupBy("day", "state").agg(count(lit(1)).as("n")),
        base)
    }, Some("""
      WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
        FROM events WHERE ts IS NOT NULL),
      base AS (
        SELECT user_id, day,
               lag(day) OVER w AS prevw, lead(day) OVER w AS nextw
        FROM uw WINDOW w AS (PARTITION BY user_id ORDER BY day)),
      mw AS (SELECT max(day) AS maxday FROM uw),
      states AS (
        SELECT day,
               CASE WHEN prevw IS NULL THEN 'new'
                    WHEN prevw = day - 1 THEN 'retained'
                    ELSE 'resurrected' END AS state
        FROM base
        UNION ALL
        SELECT day + 1, 'churned'
        FROM base, mw
        WHERE (nextw IS NULL OR nextw > day + 1) AND day + 1 <= maxday)
      SELECT day, state, count(*) AS n FROM states GROUP BY 1, 2""")),

    // Discrete survival/hazard table — the Kaplan-Meier ingredients over
    // user lifetimes, kept EXACT: per observed lifetime k (hours between a
    // user's first and last event), the risk set (users surviving >= k),
    // the churn count at k, and the hazard d_k/n_k in integer ppm. The
    // survival curve itself is the running product of (1 - hazard) — a
    // float chain both engines would order identically but downstream
    // consumers rebuild it trivially, so the gate pins the exact integer
    // ingredients instead. Shape: one user collapse (the only data-sized
    // shuffle), then a lifetime-domain-sized relation; the risk set is a
    // reverse cumulative sum over that tiny domain, never over users.
    Q("sq_hazard", (s, d) => {
      val life = tbl(s, d, "events")
        .filter(col("ts").isNotNull && col("user_id").isNotNull)
        .select(col("user_id"), Q.tsBucket(col("ts"), 3600000000L).as("hr"))
        .groupBy("user_id")
        .agg((max("hr") - min("hr")).as("k"))
      val byK = life.groupBy("k").agg(count(lit(1)).as("n_churn"))
      val wRisk = Window.orderBy(col("k").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byK.withColumn("n_risk", sum("n_churn").over(wRisk))
        .select(col("k"), col("n_churn"), col("n_risk"),
          expr("(n_churn * 1000000) div n_risk").as("hazard_ppm"))
    }, Some("""
      WITH life AS (
        SELECT user_id,
               max(CAST(floor(epoch(ts) / 3600) AS BIGINT))
                 - min(CAST(floor(epoch(ts) / 3600) AS BIGINT)) AS k
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        GROUP BY user_id),
      byk AS (SELECT k, count(*) AS n_churn FROM life GROUP BY 1)
      SELECT k, n_churn,
             CAST(sum(n_churn) OVER (ORDER BY k DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_risk,
             (n_churn * 1000000) // CAST(sum(n_churn) OVER (ORDER BY k DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS hazard_ppm
      FROM byk""")),

    // RFM segmentation — the classic recency/frequency/monetary customer
    // grid with FIXED business band edges (the production form: edges are
    // policy constants, not data quantiles — exact data quantiles of a
    // user-sized relation would need a global sort; the quantile
    // machinery itself is gated separately by q21/sk_ddsketch). Recency
    // is hours since the user's last event relative to the corpus
    // watermark (a broadcast 1-row fold); frequency and monetary are the
    // user collapse's exact count/micro-sum. One data-sized shuffle (the
    // user collapse), one broadcast, one segment-sized aggregate.
    Q("sq_rfm", (s, d) => {
      val users = tbl(s, d, "events")
        .select(col("user_id"), Q.tsMicros(col("ts")).as("us"),
          expr("CAST(round(value * 1000000) AS BIGINT)").as("qv"))
        .groupBy("user_id")
        .agg(max("us").as("r_us"), count(lit(1)).as("f"), sum("qv").as("m"))
      val tmax = tbl(s, d, "events")
        .groupBy().agg(max(Q.tsMicros(col("ts"))).as("tmax"))
      users.crossJoin(broadcast(tmax))
        .withColumn("r_band", expr(RFM_R))
        .withColumn("f_band", expr(RFM_F))
        .withColumn("m_band", expr(RFM_M))
        .groupBy("r_band", "f_band", "m_band")
        .agg(count(lit(1)).as("n_users"), sum("f").as("sum_f"),
          sum("m").as("sum_m"))
    }, Some(s"""
      WITH u AS (
        SELECT user_id, max(epoch_us(ts)) AS r_us, count(*) AS f,
               CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS m
        FROM events GROUP BY 1),
      t AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
      b AS (
        SELECT $RFM_R AS r_band, $RFM_F AS f_band, $RFM_M AS m_band, f, m
        FROM u, t)
      SELECT r_band, f_band, m_band, count(*) AS n_users,
             CAST(sum(f) AS BIGINT) AS sum_f, CAST(sum(m) AS BIGINT) AS sum_m
      FROM b GROUP BY 1, 2, 3""")),

    // Feature-leakage audit — the train/serve-skew check a feature store
    // runs before a model ships: for every label event (purchase), the
    // PIT-correct feature is the user's last click STRICTLY BEFORE the
    // label (a running window max — merge_asof without the join), while
    // the naive join a leaky pipeline writes picks the user's last click
    // OVERALL (an unordered partition max over the same pass). A label
    // leaks when the naive pick reads the future. Per label-day: label
    // count, labels with any PIT feature, leaky labels, and the leak
    // share. One user-partitioned pass computes both variants — the
    // audit costs one window scan, no joins.
    Q("ft_leakage_audit", (s, d) => {
      val wOrd = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wAll = Window.partitionBy("user_id")
      tbl(s, d, "events")
        .filter(col("ts").isNotNull) // time-ordered contract (see sq_funnel_time)
        .select(col("user_id"), col("event_id"), col("event_type"),
          Q.tsMicros(col("ts")).as("us"))
        .withColumn("pit_us",
          max(when(col("event_type") === "click", col("us"))).over(wOrd))
        .withColumn("naive_us",
          max(when(col("event_type") === "click", col("us"))).over(wAll))
        .filter(col("event_type") === "purchase")
        .groupBy(expr("us div 86400000000").as("day"))
        .agg(count(lit(1)).as("n_labels"),
          sum(when(col("pit_us").isNotNull, 1L).otherwise(0L)).as("n_pit"),
          sum(when(col("naive_us") > col("us"), 1L).otherwise(0L))
            .as("n_leaky"))
        .withColumn("leak_share", expr("n_leaky / n_labels"))
    }, Some("""
      WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        FROM events WHERE ts IS NOT NULL),
      f AS (
        SELECT user_id, event_id, event_type, us,
               max(CASE WHEN event_type = 'click' THEN us END)
                 OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS pit_us,
               max(CASE WHEN event_type = 'click' THEN us END)
                 OVER (PARTITION BY user_id) AS naive_us
        FROM e)
      SELECT us // 86400000000 AS day, count(*) AS n_labels,
             CAST(sum(CASE WHEN pit_us IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_pit,
             CAST(sum(CASE WHEN naive_us > us THEN 1 ELSE 0 END)
               AS BIGINT) AS n_leaky,
             CAST(sum(CASE WHEN naive_us > us THEN 1 ELSE 0 END) AS BIGINT)
               / count(*) AS leak_share
      FROM f WHERE event_type = 'purchase' GROUP BY 1""")),

    // Deterministic epoch reshuffle — the op every training run performs
    // on the full corpus, once per epoch: a seeded pseudorandom
    // PERMUTATION of the documents, reproducible across reruns and
    // different across epochs, materialized as (shard, rank-within-
    // shard). Scale shape: shard assignment comes FIRST (a hash digit of
    // the per-epoch key), so the only window is partitioned by
    // (epoch, shard) — 100 TB ranks in parallel across shards, never one
    // global data-sized sort. The permutation key is md5 of doc_id:epoch
    // (identical hex in both engines), so the gate pins the exact order:
    // chk = sum(rank * doc_id) changes if ANY two docs swap places.
    Q("ft_epoch_shuffle", (s, d) => {
      val epochs = broadcast(s.range(0, 2).select(col("id").as("epoch")))
      val w = Window.partitionBy("epoch", "shard").orderBy("k", "doc_id")
      tbl(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id").isNotNull) // key contract: NULL ids excluded
        .crossJoin(epochs)
        .withColumn("k", md5(concat(col("doc_id").cast("string"), lit(":"),
          col("epoch").cast("string"))))
        .withColumn("shard", expr(
          "CAST((locate(substr(k, 1, 1), '0123456789abcdef') - 1) % 8 AS BIGINT)"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .groupBy("epoch", "shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("doc_id").as("sum_ids"),
          sum(col("rn") * col("doc_id")).as("chk"),
          min("k").as("k_lo"), max("k").as("k_hi"))
    }, Some("""
      WITH e AS (SELECT CAST(0 AS BIGINT) AS epoch
                 UNION ALL SELECT CAST(1 AS BIGINT)),
      k AS (
        SELECT doc_id, epoch,
               md5(CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR))
                 AS k
        FROM documents, e WHERE doc_id IS NOT NULL),
      sh AS (
        SELECT doc_id, epoch, k,
               CAST((strpos('0123456789abcdef', substr(k, 1, 1)) - 1) % 8
                 AS BIGINT) AS shard
        FROM k),
      r AS (
        SELECT *, row_number()
                 OVER (PARTITION BY epoch, shard ORDER BY k, doc_id) AS rn
        FROM sh)
      SELECT epoch, shard, count(*) AS n_docs,
             CAST(sum(doc_id) AS BIGINT) AS sum_ids,
             CAST(sum(rn * doc_id) AS BIGINT) AS chk,
             min(k) AS k_lo, max(k) AS k_hi
      FROM r GROUP BY 1, 2""")),

    // Grouped k-fold assignment — the leakage-safe split for user-keyed
    // training data: the fold is a pure function of the USER (md5 head
    // byte % 5, same cross-engine bucket as tx_sample_split), so every
    // event of a user lands in exactly one fold — the grouped-CV contract
    // that keeps a user's own history out of both train AND validation of
    // the same fold (tx_sample_split is the doc-level cousin; the GROUP
    // key is what changes here). Pure-function assignment = join-free:
    // any shard of a 100 TB event log folds independently, and the only
    // shuffles are the per-fold aggregate and the distinct-user collapse
    // the fold-size report itself requires. A NULL user_id folds to the
    // NULL group in both engines (md5(NULL) is NULL end to end).
    Q("ft_kfold", (s, d) => {
      tbl(s, d, "events")
        .withColumn("fold", expr(s"${CurationOps.bucket("user_id")} % 5"))
        .groupBy("fold")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purch"))
        .withColumn("purch_share", expr("n_purch / n_events"))
    }, Some(s"""
      WITH f AS (
        SELECT ${CurationOps.bucketSql("user_id")} % 5 AS fold,
               user_id, event_type
        FROM events)
      SELECT fold, count(*) AS n_events,
             count(DISTINCT user_id) AS n_users,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_purch,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) / count(*) AS purch_share
      FROM f GROUP BY fold""")),

    // Out-of-fold target encoding — the leakage-safe categorical encoding
    // (mean label per category, each row's own fold EXCLUDED so no row
    // sees its own label): enc(source, fold) = (c_tot - c_fold) /
    // (n_tot - n_fold) over label = n_chars >= corpus-median, fold from
    // ft_kfold's md5 bucket of the doc id. The median is COMPUTED, not a
    // constant: pass 1 aggregates per-n_chars counts (map-side
    // combinable, output bounded by the distinct-length cardinality, not
    // the data), a cumulative window over that tiny relation finds the
    // two middle order statistics, and their mean broadcasts back as a
    // 1-row relation — so the operator is callable on any corpus, same
    // pattern as q40_histogram's bounds. Scale shape: TWO data-sized
    // passes (median counts, then the per-(source, fold) conditional
    // aggregate); the OOF complement is a window over the AGGREGATED
    // relation — K sources x 5 folds rows, never the data — and the
    // smoothing prior is a broadcast 1-row fold of the same tiny
    // relation. enc_oof rides try_divide so a single-fold source yields
    // NULL like the oracle's x/0; enc_smooth's denominator is always
    // positive (m = 20).
    Q("ft_target_encode", (s, d) => {
      val docs = tbl(s, d, "documents")
      // interpolated corpus median of n_chars from per-value counts:
      // positions (n+1) div 2 and (n+2) div 2 of the sorted multiset
      // (equal when n is odd), averaged — matching DuckDB's median(),
      // including its NULL handling: NULL lengths are excluded from the
      // count relation OUTSIDE the window (Spark windows sort NULLS
      // FIRST, DuckDB NULLS LAST — leaving them in would shift every
      // cumulative count between the engines)
      val cum = docs.filter(col("n_chars").isNotNull)
        .groupBy(col("n_chars").as("v"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("v"), sum("cnt").over(Window.orderBy("v")).as("cc"))
        .withColumn("n", max("cc").over(Window.partitionBy()))
      val thr = cum.groupBy()
        .agg(((min(when(expr("cc >= (n + 1) div 2"), col("v"))) +
          min(when(expr("cc >= (n + 2) div 2"), col("v")))) / lit(2.0))
          .as("thr"))
      val perFold = docs
        .crossJoin(broadcast(thr))
        .withColumn("fold", expr(s"${CurationOps.bucket("doc_id")} % 5"))
        .withColumn("y", when(col("n_chars") >= col("thr"), 1L).otherwise(0L))
        .groupBy("source", "fold")
        .agg(count(lit(1)).as("n_in"), sum("y").as("c_in"))
      val prior = perFold.groupBy()
        .agg(sum("n_in").as("nt"), sum("c_in").as("ct"))
      val w = Window.partitionBy("source")
      perFold
        .withColumn("n_oof", sum("n_in").over(w) - col("n_in"))
        .withColumn("c_oof", sum("c_in").over(w) - col("c_in"))
        .crossJoin(broadcast(prior))
        .withColumn("enc_oof", expr("try_divide(c_oof, n_oof)"))
        .withColumn("enc_smooth",
          expr("(c_oof + 20 * (ct / nt)) / (n_oof + 20)"))
        .select("source", "fold", "n_in", "c_in", "n_oof", "c_oof",
          "enc_oof", "enc_smooth")
    }, Some(s"""
      WITH vc AS (
        SELECT n_chars AS v, count(*) AS cnt FROM documents
        WHERE n_chars IS NOT NULL GROUP BY 1),
      cum0 AS (
        SELECT v, sum(cnt) OVER (ORDER BY v) AS cc FROM vc),
      cum AS (
        SELECT v, cc, max(cc) OVER () AS n FROM cum0),
      thr AS (
        SELECT (min(CASE WHEN cc >= (n + 1) // 2 THEN v END)
              + min(CASE WHEN cc >= (n + 2) // 2 THEN v END)) / 2.0 AS thr
        FROM cum),
      b AS (
        SELECT source, ${CurationOps.bucketSql("doc_id")} % 5 AS fold,
               CASE WHEN n_chars >= thr THEN 1 ELSE 0 END AS y
        FROM documents CROSS JOIN thr),
      pf AS (
        SELECT source, fold, count(*) AS n_in,
               CAST(sum(y) AS BIGINT) AS c_in
        FROM b GROUP BY 1, 2),
      pr AS (
        SELECT CAST(sum(n_in) AS BIGINT) AS nt,
               CAST(sum(c_in) AS BIGINT) AS ct
        FROM pf),
      oof AS (
        SELECT source, fold, n_in, c_in,
               sum(n_in) OVER (PARTITION BY source) - n_in AS n_oof,
               sum(c_in) OVER (PARTITION BY source) - c_in AS c_oof
        FROM pf)
      SELECT source, fold, n_in, c_in,
             CAST(n_oof AS BIGINT) AS n_oof, CAST(c_oof AS BIGINT) AS c_oof,
             c_oof / n_oof AS enc_oof,
             (c_oof + 20 * (ct / nt)) / (n_oof + 20) AS enc_smooth
      FROM oof CROSS JOIN pr""")),

    // Bayesian A/B — the conjugate Beta(1,1)-Binomial read of the same
    // user-level conversion table as ab_chisq (arm = user_id % 3, conv =
    // any high-value purchase): posterior Beta(1 + c, 1 + n - c) mean,
    // variance, and the normal-approximation 95% credible interval per
    // arm. Same two-aggregate shape as ab_chisq (user collapse is the
    // only data-sized shuffle); the posterior moments ride as DOUBLES
    // from the start (a BIGINT (a+b)^3 overflows at billions of users —
    // the double tree is the 100 TB-safe form and both engines evaluate
    // the identical spliced text). Denominators are never zero: the
    // prior makes a1, b1 >= 1. Arm assignment is pmod on the Spark side
    // and ((x % 3) + 3) % 3 in the oracle — identical even for negative
    // user_ids (DuckDB's plain % takes the dividend's sign; pmod never
    // goes negative), so the gate does not rest on the corpus happening
    // to have non-negative ids. Same convention across all ab_* gates.
    Q("ab_bayes", (s, d) => {
      tbl(s, d, "events")
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase" &&
          col("value") >= 150.0, 1L).otherwise(0L)).as("conv"))
        .withColumn("arm", pmod(col("user_id"), lit(3L)))
        .groupBy("arm")
        .agg(count(lit(1)).as("n"), sum("conv").as("c"))
        .withColumn("a1", expr("CAST(1 + c AS DOUBLE)"))
        .withColumn("b1", expr("CAST(1 + n - c AS DOUBLE)"))
        .withColumn("post_mean", expr(BAYES_MEAN))
        .withColumn("post_var", expr(BAYES_VAR))
        .withColumn("ci_lo", expr(s"$BAYES_MEAN - 1.96 * sqrt($BAYES_VAR)"))
        .withColumn("ci_hi", expr(s"$BAYES_MEAN + 1.96 * sqrt($BAYES_VAR)"))
        .select("arm", "n", "c", "post_mean", "post_var", "ci_lo", "ci_hi")
    }, Some(s"""
      WITH u AS (
        SELECT user_id, ((user_id % 3) + 3) % 3 AS arm,
               max(CASE WHEN event_type = 'purchase' AND value >= 150.0
                        THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY 1, 2),
      g AS (
        SELECT arm, count(*) AS n, CAST(sum(conv) AS BIGINT) AS c
        FROM u GROUP BY arm),
      x AS (
        SELECT arm, n, c, CAST(1 + c AS DOUBLE) AS a1,
               CAST(1 + n - c AS DOUBLE) AS b1
        FROM g)
      SELECT arm, n, c, $BAYES_MEAN AS post_mean, $BAYES_VAR AS post_var,
             $BAYES_MEAN - 1.96 * sqrt($BAYES_VAR) AS ci_lo,
             $BAYES_MEAN + 1.96 * sqrt($BAYES_VAR) AS ci_hi
      FROM x""")))

  /** RFM band edges — business constants, shared text. Recency in hours
    * since the corpus watermark; monetary in value micros.
    */
  private val RFM_R = """CASE WHEN tmax - r_us < 21600000000 THEN 'hot'
       WHEN tmax - r_us < 86400000000 THEN 'warm'
       ELSE 'cold' END""".replace("\n", " ")
  private val RFM_F =
    "CASE WHEN f >= 70 THEN 'high' WHEN f >= 55 THEN 'mid' ELSE 'low' END"
  private val RFM_M = """CASE WHEN m >= 3500000000 THEN 'high'
       WHEN m >= 2500000000 THEN 'mid' ELSE 'low' END""".replace("\n", " ")

  /** Uniform-thirds chi-square over exact arm counts — one text, both
    * engines; `nt/3` is int-by-int `/`, DOUBLE in both.
    */
  private val SRM_EXPR =
    """(k0 - nt/3)*(k0 - nt/3)/(nt/3) + (k1 - nt/3)*(k1 - nt/3)/(nt/3)
       + (k2 - nt/3)*(k2 - nt/3)/(nt/3)""".stripMargin.replace("\n", "")

  /** Beta-posterior moments over the double-cast counts — one text,
    * spliced into both engines so the IEEE op tree is identical.
    */
  private val BAYES_MEAN = "a1 / (a1 + b1)"
  private val BAYES_VAR =
    "a1 * b1 / ((a1 + b1) * (a1 + b1) * (a1 + b1 + 1))"

  private val TREND_EXPR = "tn / tc"
  private val SEAS_EXPR = "sn / sc - gs / gn"
  private val RESID_EXPR = "x - tn / tc - (sn / sc - gs / gn)"
}
