package graft

import org.scalatest.funsuite.AnyFunSuite

/** Zero-row-input contract: at 100 TB, empty slices are routine (a new
  * partition, a filtered date range, a tenant with no data yet), and a
  * query that CRASHES on one is an operational incident. This spec pins
  * the degenerate-input behavior of every gate family that once crashed on
  * an all-empty table set (found by sweeping all 289 gates over zero-row
  * tables; each was also cross-checked hash-identical against its DuckDB
  * oracle on the same empty tables):
  *
  *  - ANSI divide-by-zero on zero-variance groups (ts_xcorr, ab_cuped,
  *    sq_markov_removal, dq_referential) -> try_divide NULL, like the
  *    oracle's DOUBLE x/0
  *  - NULL scalar folds from empty aggregates (gr_hits max) -> unused
  *    divisor fallback, zero output rows
  *  - Spark's stat.bloomFilter NPE on empty input (tx_decontam_bloom) ->
  *    explicit never-matching filter
  *  - BPE training demanding more merges than an exhausted/empty corpus
  *    holds (tx_bpe_*) -> stop early, zero-row merge table
  *  - schema inference over an all-empty partitioned parquet write
  *    (src_partitioned_prune, ann_ivf_disk) -> explicit read schema
  *  - assumeComplete zarr stores written sparsely (px_zarr_complete) ->
  *    densified write (explicit all-fill chunks)
  *  - SQL-standard grand-total grouping set on empty input (q13_rollup,
  *    q24_cube) -> restored explicitly (Spark's Expand emits nothing)
  *  - conditional-sum NULLs where the oracle's count(*) FILTER is 0
  *    (dq_check, dq_profile, ab_srm) -> coalesce / CASE shape
  */
class EmptyInputSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  /** Zero-row copies of every table, schemas cloned from sf0.001. */
  private lazy val emptyDir: String = {
    val dir = TempDirs.create("graft_empty_sf")
    val src = "/root/testdata/sf0.001"
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    dir
  }

  private def rows(name: String): Long =
    SparkEntry.queries(name)(spark, emptyDir).count()

  test("formerly-crashing gates run on all-empty tables with oracle-shaped output") {
    // zero-row families: each once threw (ANSI division, NULL scalar fold,
    // bloom NPE, BPE exhaustion, schema inference, sparse complete store)
    for (q <- Seq("ts_xcorr", "gr_hits", "tx_decontam_bloom", "tx_bpe_train",
        "tx_bpe_apply", "sq_markov_removal", "src_partitioned_prune",
        "ann_ivf_disk", "px_zarr_complete", "px_zarr_grouped"))
      assert(rows(q) == 0L, s"$q should yield zero rows on empty input")
    // grand-total families: one summary row even over nothing
    assert(rows("q13_rollup") == 1L, "rollup keeps the () grouping set")
    assert(rows("q24_cube") == 1L, "cube keeps the () grouping set")
    assert(rows("ab_srm") == 1L)
    // per-rule / per-column reports keep their full shape at count 0
    assert(rows("dq_check") == 5L)
    assert(rows("dq_profile") == 5L)
    assert(rows("dq_referential") == 2L)
  }

  /** Single-row copies: the off-by-one frontier (n-1 = 0 variances, lone
    * arms, one-tile pixel grids, empty centroid strata).
    */
  private lazy val oneRowDir: String = {
    val dir = TempDirs.create("graft_onerow_sf")
    val src = "/root/testdata/sf0.001"
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      spark.read.parquet(s"$src/$t.parquet").limit(1)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    dir
  }

  test("single-row tables: degenerate statistics go NULL, sparse grids densify") {
    def run(name: String) = SparkEntry.queries(name)(spark, oneRowDir)
    // one event: a lone arm (n=0 or n-1=0 variance) must yield NULL stats
    // like DuckDB's x/0, not an ANSI error or a driver ArithmeticException
    for (q <- Seq("ab_chisq", "ab_welch", "ab_cuped"))
      assert(run(q).count() == 1L, s"$q should emit its summary row")
    assert(run("vec_pca_power").count() == 64L,
      "rank-deficient Gram: 64 NULL-iterate rows, not / by zero")
    // one lineitem row populates ONE tile of the 6x4 pixel grid: the dense
    // dask-array frame is restored by marker-row densify, and the lone
    // object survives the full pipeline
    assert(run("px_image2labels").count() == 1L)
    // empty centroid / codebook strata assign and encode nothing
    assert(run("ann_pq_native").count() == 0L)
  }

  /** NULL-injected copies: keys intact, every 3rd/5th non-key value NULL
    * (text, embedding, value, prices) — the real-data regime where custom
    * expressions and typed encoders meet missing fields.
    */
  private lazy val nullDir: String = {
    val dir = TempDirs.create("graft_null_sf")
    val src = "/root/testdata/sf0.001"
    def stage(t: String, proj: String): Unit =
      spark.read.parquet(s"$src/$t.parquet").selectExpr(proj.split(";"): _*)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    stage("documents", "doc_id;IF(doc_id % 3 = 1, NULL, text) AS text;" +
      "IF(doc_id % 5 = 2, NULL, lang) AS lang;source;n_chars")
    stage("embeddings",
      "vec_id;IF(vec_id % 3 = 1, NULL, embedding) AS embedding;label")
    stage("events", "event_id;ts;user_id;event_type;" +
      "IF(event_id % 3 = 1, NULL, value) AS value;props")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem"))
      spark.read.parquet(s"$src/$t.parquet")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    dir
  }

  test("NULL-injected tables: measurements skip, signatures drop, encoders survive") {
    def run(name: String) = SparkEntry.queries(name)(spark, nullDir)
    // typed aggregator + sketch + quantile: NULL is not a measurement
    assert(run("ag_weighted_mean").count() == 5L)
    assert(run("q21_quantile").count() == 5L)
    assert(run("sk_ddsketch").count() > 0L)
    // NULL text -> no signature; NULL-text docs still terminate in packing
    val sigs = run("dd_simhash").count()
    assert(sigs > 0L && sigs < 500L, s"null-text docs must drop: $sigs")
    assert(run("tx_pack_tokens").count() > 0L)
    // fixed-width NULL slot round-trips (all-spaces encode/decode)
    assert(run("src_fixedwidth").count() > 0L)
    // NULL embeddings leave the vector ops' corpus
    assert(run("vec_gram").count() == 2080L)
  }

  /** NULL KEYS — timestamps and group keys: the regime where engine
    * defaults diverge silently (Spark windows order NULLS FIRST, DuckDB
    * LAST; equi-joins drop NULL keys; streaming windows drop NULL times).
    */
  private lazy val nullKeyDir: String = {
    val dir = TempDirs.create("graft_nullkey_sf")
    val src = "/root/testdata/sf0.001"
    spark.read.parquet(s"$src/events.parquet").selectExpr(
      "event_id", "IF(event_id % 7 = 4, NULL, ts) AS ts", "user_id",
      "IF(event_id % 11 = 5, NULL, event_type) AS event_type",
      "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    spark.read.parquet(s"$src/orders.parquet").selectExpr(
      "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "IF(o_orderkey % 9 = 4, NULL, o_orderdate) AS o_orderdate",
      "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    spark.read.parquet(s"$src/lineitem.parquet").selectExpr(
      "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus",
      "IF(l_orderkey % 9 = 4, NULL, l_shipdate) AS l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "documents", "embeddings"))
      spark.read.parquet(s"$src/$t.parquet")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    dir
  }

  test("NULL time/group keys: time-ordered ops exclude them, groups keep them") {
    def run(name: String) = SparkEntry.queries(name)(spark, nullKeyDir)
    // journeys/versions/as-of merges operate on timestamped events only
    for (q <- Seq("sq_markov", "sq_user_seq", "aj_asof", "q22_scd2"))
      assert(run(q).count() > 0L, s"$q must run on null-key input")
    // a NULL group key IS a group: quantiles must not lose it through an
    // equi-join (6 type groups = 5 named + NULL)
    assert(run("q21_quantile").count() == 6L)
    assert(run("sk_hll_users").count() == 6 * 64L)
    // split-writes must PARTITION the feed (null-safe splits, and the
    // second time-travel commit carries the un-timestamped rows): both
    // versions see all 6 type groups, NULL included
    assert(run("src_time_travel").count() == 12L)
  }

  test("grand-total and report rows carry zeros, not NULL verdicts") {
    val cube = SparkEntry.queries("q24_cube")(spark, emptyDir).collect()(0)
    assert(cube.getAs[Long]("n") == 0L && cube.getAs[Long]("gid") == 3L)
    val srm = SparkEntry.queries("ab_srm")(spark, emptyDir).collect()(0)
    assert(srm.getAs[Long]("srm_flag") == 0L, "NULL chisq must flag 0")
    val checks = SparkEntry.queries("dq_check")(spark, emptyDir).collect()
    assert(checks.forall(r => r.getAs[Long]("violations") == 0L &&
      r.getAs[Boolean]("pass")), "empty partition passes every expectation")
  }
}
