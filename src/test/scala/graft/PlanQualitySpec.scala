package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the properties that make these queries
  * scale are asserted, not hoped for — column pruning at the scan, pushed
  * filters, broadcast dimension joins, and the two-exchange bound on the
  * tile pipeline.
  */
class PlanQualitySpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  /** The round-17 input-parallelism spread (Q.spreadSmallScan) inserts one
    * `Exchange RoundRobinPartitioning(n), REPARTITION_BY_NUM` directly over
    * a narrow scan — it moves base rows once, before any derivation, and
    * disappears on a production-width input. Shuffle-shape assertions below
    * are about KEYED data movement (joins/aggregates/windows), so they
    * count exchanges with the spread lines removed.
    */
  private def noSpread(p: String): String =
    // only the spread's exact signature is exempt (r17 ADVICE): a stray
    // round-robin exchange from any OTHER source (an AQE rebalance, a
    // repartition() without an explicit count) must still trip the
    // keyed-shuffle assertions below
    p.linesIterator.filterNot(l =>
      l.contains("Exchange RoundRobinPartitioning") &&
        l.contains("REPARTITION_BY_NUM"))
      .mkString("\n")

  test("q1_agg scan is pruned to the referenced columns with partial aggregation") {
    val p = plan("q1_agg")
    assert(p.contains("ReadSchema"))
    // the 5 referenced columns and nothing more
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse(
      p.split("ReadSchema").last)
    for (c <- Seq("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount")) assert(read.contains(c), s"missing $c")
    assert(!read.contains("l_shipdate"), "scan reads unreferenced columns")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"),
      "expected partial/final hash aggregation")
  }

  test("q6_filter pushes predicates into the parquet scan") {
    val p = plan("q6_filter")
    assert(p.contains("PushedFilters: [") &&
      (p.contains("GreaterThanOrEqual(l_discount") ||
        p.contains("LessThan(l_quantity")),
      s"filters not pushed:\n$p")
  }

  test("q3_dim_join broadcasts both dimension tables") {
    val p = plan("q3_dim_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2,
      s"expected 2 broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), "dimension join degenerated to SMJ")
  }

  test("ann_topk broadcasts the query stratum, not the corpus") {
    val p = plan("ann_topk")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast join:\n$p")
  }

  test("px_pipeline is bounded by two exchanges") {
    val p = plan("px_pipeline")
    val n = "Exchange".r.findAllIn(p).size
    assert(n <= 2, s"tile pipeline grew to $n exchanges:\n$p")
  }

  test("px_overlap_diag adds NO exchange beyond the prepare halo shuffle") {
    // the diagnostic is tile-local (a free rider on the prepared stage):
    // one exchange from prepareInput, nothing from the margin-face scan
    val p = plan("px_overlap_diag")
    val n = "Exchange".r.findAllIn(p).size
    assert(n <= 1, s"overlap diagnostic grew to $n exchanges:\n$p")
    assert(!p.contains("Join"), s"diagnostic must not join:\n$p")
  }

  test("px_sort_dist and geo_image2geojson avoid cartesians") {
    for (q <- Seq("px_sort_dist", "geo_image2geojson")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to a nested-loop join:\n$p")
    }
  }

  test("aj_asof plans the custom operator, one exchange per side, no explosion") {
    val p = plan("aj_asof")
    assert(p.contains("AsOfJoin"), s"custom as-of operator not planned:\n$p")
    assert(!p.contains("BroadcastNestedLoop"), "as-of degenerated to BNLJ")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3,
      s"as-of query grew extra exchanges:\n$p")
  }

  test("ann_ivf uses aggregate argmax (no row_number window over candidates)") {
    val p = plan("ann_ivf")
    assert(!p.contains("Window"), s"argmax degenerated to a window:\n$p")
    assert(p.contains("partial_max") || p.contains("HashAggregate"),
      "expected map-side partial aggregation for the argmax")
  }

  test("sk_kmv_users runs the sketch with map-side partial aggregation") {
    val p = plan("sk_kmv_users")
    assert(p.contains("ObjectHashAggregate"),
      s"TypedImperativeAggregate should plan as ObjectHashAggregate:\n$p")
    assert(p.contains("partial_kmin_strings"),
      s"expected a partial (map-side) sketch phase:\n$p")
  }

  test("sk_kmv_overlap keeps both sketch passes map-side partial") {
    val p = plan("sk_kmv_overlap")
    assert(p.contains("ObjectHashAggregate"),
      s"TypedImperativeAggregate should plan as ObjectHashAggregate:\n$p")
    assert(p.contains("partial_kmin_strings"),
      s"expected a partial (map-side) sketch phase:\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"set-operation stage must stay aggregate-only:\n$p")
  }

  test("selection ops broadcast their vocabulary-sized join-back sides") {
    val bp = plan("tx_boilerplate")
    assert(bp.contains("BroadcastHashJoin") && !bp.contains("CartesianProduct"),
      s"boilerplate set should broadcast:\n$bp")
    val clf = plan("tx_quality_clf")
    assert(clf.contains("BroadcastHashJoin") && !clf.contains("Window"),
      s"weight table should broadcast, no windows:\n$clf")
    val ws = plan("tx_weighted_sample")
    assert(ws.contains("Window") && !ws.contains("Exchange SinglePartition"),
      s"sampling window must stay source-partitioned:\n$ws")
  }

  test("rj_concurrency is a partitioned sweep, no self-join") {
    val p = plan("rj_concurrency")
    assert(p.contains("Window") && !p.contains("Exchange SinglePartition"),
      s"sweep window must stay user-partitioned:\n$p")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      s"sweep line degenerated to a pairwise plan:\n$p")
  }

  test("iterative graph ops stay equi-join + aggregate shaped") {
    // (gr_hits' per-side max IS a 1-row global aggregate — a scalar
    // SinglePartition exchange is its correct plan, so only pairwise
    // shapes are banned here)
    for (q <- Seq("gr_hits", "gr_kcore")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q grew a cartesian stage:\n$p")
      assert(!p.contains("Window"), s"$q should not need windows:\n$p")
    }
  }

  test("aj_resample: both windows share one exchange and one sort") {
    val p = plan("aj_resample")
    // one shuffle on user_id feeds the fill window AND the range-frame
    // count window — the (t) ordering is a prefix of (t, is_grid), so the
    // second window must not re-sort or re-exchange
    val windows = "(?m)^\\s*(?:\\+- |:- )?Window ".r.findAllIn(p).size
    val sorts = "(?m)^\\s*(?:\\+- |:- )?\\*?\\(?\\d*\\)?\\s*Sort ".r.findAllIn(p).size
    assert(windows == 2, s"expected 2 Window nodes, got $windows:\n$p")
    assert(sorts == 1, s"windows re-sorted ($sorts sorts):\n$p")
  }

  test("gr_linkpred candidate pairs come from the equi-self-join only") {
    val p = plan("gr_linkpred")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"link-prediction degenerated to all-pairs:\n$p")
  }

  test("mm_phash_pairs candidates come from the band equi-join only") {
    val p = plan("mm_phash_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"banded Hamming search degenerated to all-pairs:\n$p")
  }

  test("rj_windows is an equi-join on bins, not a nested loop") {
    val p = plan("rj_windows")
    assert(!p.contains("BroadcastNestedLoop"),
      s"range join degenerated to a nested loop:\n$p")
  }

  test("ann_pq encodes and scores with broadcast equi-joins, no window, no loop") {
    val p = plan("ann_pq")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"PQ stage degenerated to a pairwise plan:\n$p")
    assert(!p.contains("Window"), s"argmin/argmax degenerated to a window:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"codebook/LUT should broadcast:\n$p")
  }

  test("ann_pq_native is one scan + one projection: no join, no shuffle") {
    val p = noSpread(plan("ann_pq_native"))
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"the fused encoder must not shuffle or join:\n$p")
    assert(p.toLowerCase.contains("pqencodeword"),
      s"native expression not planned:\n$p")
    // the projection itself interprets because the surrounding quantization
    // transform() is a HigherOrderFunction (CodegenFallback); the encoder
    // supplies doGenCode for stages that can fuse it
    assert("FileScan".r.findAllIn(p).size == 1, s"expected a single scan:\n$p")
  }

  test("ann_ivfpq prunes to the query's cluster with no pairwise stage") {
    val p = plan("ann_ivfpq")
    assert(!p.contains("CartesianProduct"),
      s"cluster pruning degenerated to a pairwise plan:\n$p")
    assert(!p.contains("Window"), s"argmin/argmax degenerated to a window:\n$p")
    // the only nested loop is the 13-row coarse fan-out inside the CACHED
    // assignment plan — every InMemoryRelation occurrence reprints it, so
    // bound the count by the relation count rather than by 1
    assert(p.contains("InMemoryTableScan"),
      s"coarse assignment should be computed once (cached), not inlined 4x:\n$p")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <=
      "InMemoryRelation".r.findAllIn(p).size,
      s"a nested loop outside the cached fan-out:\n$p")
    assert("BroadcastHashJoin \\[m#\\d+L?, code#\\d+L?, ccid#\\d+L?\\]".r
      .findFirstIn(p).isDefined,
      s"scoring join must hash on (subspace, code, cluster):\n$p")
  }

  test("dd_embed_cos candidates come from the LSH bucket equi-join") {
    val p = plan("dd_embed_cos")
    assert(!p.contains("CartesianProduct"),
      s"quadratic candidate generation crept back:\n$p")
    // the only nested loops allowed are the two 4-row hyperplane fan-outs
    // (corpus x broadcast(planes)); the vector-pair join itself must be an
    // equi-join on the bucket signature
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2,
      s"candidate pairs planned as a nested loop:\n$p")
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[bucket".r
      .findFirstIn(p).isDefined,
      s"expected an equi-join on the bucket signature:\n$p")
  }

  test("vec_dot_pairs broadcasts the small stratum (no shuffled cartesian)") {
    val p = plan("vec_dot_pairs")
    assert(!p.contains("CartesianProduct"),
      s"cross join planned as a two-sided shuffle cartesian:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"expected a nested loop over the broadcast stratum:\n$p")
  }

  test("js_salted shuffles on the salted key, spreading the 5 hot types") {
    val p = plan("js_salted")
    assert(p.contains("ShuffledHashJoin"), s"expected the forced hash join:\n$p")
    assert(p.contains("salt"), s"join key is not salted:\n$p")
  }

  test("vec_int8_quant is one scan + one projection: no join, no shuffle") {
    val p = noSpread(plan("vec_int8_quant"))
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"per-row quantization must not shuffle or join:\n$p")
    assert("FileScan".r.findAllIn(p).size == 1, s"expected a single scan:\n$p")
  }

  test("tx_pii_scrub is one scan + one projection: no join, no shuffle") {
    val p = plan("tx_pii_scrub")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"per-row scrubbing must not shuffle or join:\n$p")
    assert("FileScan".r.findAllIn(p).size == 1, s"expected a single scan:\n$p")
  }

  test("tx_decontam broadcasts the eval side; the corpus never shuffles twice") {
    val p = plan("tx_decontam")
    assert(p.contains("BroadcastHashJoin"),
      s"the tiny eval side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"n-gram match degenerated to a pairwise plan:\n$p")
  }

  test("src_partitioned_prune prunes partitions at the directory level") {
    val p = plan("src_partitioned_prune")
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters"))
    assert(scanLine.isDefined, s"no PartitionFilters in the scan:\n$p")
    assert(scanLine.get.contains("event_type"),
      s"the partition column is not pruned on:\n$p")
    // the predicate must NOT degrade to a post-scan data filter
    assert(!p.linesIterator.exists(l =>
      l.trim.startsWith("+- Filter") && l.contains("event_type")),
      s"partition predicate applied as a row filter:\n$p")
  }

  test("px_zarr_dsv2 pushes the grid box into the DSv2 scan") {
    val p = plan("px_zarr_dsv2")
    assert(p.contains("ZarrScan"), s"DSv2 scan not planned:\n$p")
    assert(p.contains("g0 in [1, 2]"), s"grid bounds not pushed:\n$p")
    // the value predicate stays as a row filter; the g0 one must not
    assert(!p.linesIterator.exists(l =>
      l.trim.startsWith("+- Filter") && l.contains("g0#")),
      s"grid predicate applied post-scan:\n$p")
  }

  test("px_zarr_shard_dsv2 pushes the same grid box through a sharded store") {
    val p = plan("px_zarr_shard_dsv2")
    assert(p.contains("ZarrScan"), s"DSv2 scan not planned:\n$p")
    assert(p.contains("g0 in [1, 2]"), s"grid bounds not pushed:\n$p")
    assert(!p.linesIterator.exists(l =>
      l.trim.startsWith("+- Filter") && l.contains("g0#")),
      s"grid predicate applied post-scan:\n$p")
  }

  test("dd_paragraph is bounded: one window shuffle, one doc aggregate") {
    val p = noSpread(plan("dd_paragraph"))
    // sentence-key window exchange + per-doc aggregate exchange, nothing else
    assert("Exchange".r.findAllIn(p).size <= 2,
      s"dedup shape grew extra shuffles:\n$p")
    assert(!p.contains("Join"), s"reassembly must not self-join:\n$p")
  }

  test("vec_rp_project is one scan + one generator: no join, no shuffle") {
    val p = noSpread(plan("vec_rp_project"))
    assert(!p.contains("Exchange"), s"projection grew a shuffle:\n$p")
    assert(!p.contains("Join"), s"projection grew a join:\n$p")
    assert(p.contains("Generate"), s"expected the 8-way posexplode:\n$p")
  }

  test("tx_decontam_bloom prefilters before the broadcast verify join") {
    val p = plan("tx_decontam_bloom")
    assert(p.contains("BroadcastHashJoin"), s"verify join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"verify join shuffled:\n$p")
    // the bloom prefilter must sit below the join, on the training side —
    // as the codegen'd probe EXPRESSION, never a ScalaUDF (the prefilter
    // pass touches every training shingle)
    assert(p.linesIterator.exists(l =>
      l.contains("Filter") && l.toLowerCase.contains("bloommightcontain")),
      s"bloom prefilter expression missing from the plan:\n$p")
    assert(!p.contains("UDF"), s"sketch probe fell back to a ScalaUDF:\n$p")
  }

  test("sk_cms_heavy shuffles only the sketch-surviving instances") {
    val p = plan("sk_cms_heavy")
    // one exchange: the exact count of CMS candidates (plus AQE reads);
    // the full word stream must not reach an exchange unfiltered
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"heavy-hitter shape grew extra shuffles:\n$p")
    assert(p.linesIterator.exists(l =>
      l.contains("Filter") && l.toLowerCase.contains("cmsestimate")),
      s"CMS prefilter expression missing:\n$p")
    assert(!p.contains("UDF"), s"sketch probe fell back to a ScalaUDF:\n$p")
  }

  test("aj_interp plans BOTH as-of brackets through the custom operator") {
    val p = plan("aj_interp")
    assert("AsOfJoin".r.findAllIn(p).size >= 2,
      s"expected two AsOfJoin operators (prev + next bracket):\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"as-of bracket degenerated to a loop join:\n$p")
  }

  test("gr_pagerank iterations stay equi-join + hash aggregate") {
    val p = plan("gr_pagerank")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"pagerank degenerated to a loop join:\n$p")
    assert(p.contains("HashAggregate"),
      s"contribution sum is not a hash aggregate:\n$p")
  }

  test("ann_rp_bucket broadcasts the query stratum; no window, no loop") {
    val p = plan("ann_rp_bucket")
    assert(p.contains("BroadcastHashJoin"), s"code join not broadcast:\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"rp-bucket grew a window or loop:\n$p")
  }

  test("st_px_zarr_write reads back through a pruned DSv2 scan") {
    // plan the READ side the gate aggregates over (the stream itself runs
    // in StreamingZarrSpec); value filter stays a row filter, scan is zarr
    val df = SparkEntry.queries("px_zarr_dsv2_write")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ZarrScan"), s"DSv2 scan not planned:\n$p")
  }

  test("tx_dsir / tx_perplexity stay equi-join + hash aggregate, no window") {
    for (q <- Seq("tx_dsir", "tx_perplexity")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to a loop join:\n$p")
      assert(!p.contains("Window"), s"$q grew a corpus window:\n$p")
      assert(p.contains("HashAggregate"), s"$q lost hash aggregation:\n$p")
    }
  }

  test("gr_labelprop rounds are equi-join + hash aggregate") {
    val p = plan("gr_labelprop")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"label propagation degenerated to a loop join:\n$p")
    assert(p.contains("HashAggregate"),
      s"argmax is not an aggregate:\n$p")
    assert(!p.contains("Window"), s"labelprop grew a window:\n$p")
  }

  test("tx_decontam_fuzzy verify joins are hash equi-joins on 8-byte keys") {
    val p = plan("tx_decontam_fuzzy")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy decontam degenerated to a loop join:\n$p")
    assert(p.contains("xxhash64"), s"verify join keys are not hashed:\n$p")
  }

  test("tx_curate_full: five stages, no cartesian, no corpus window") {
    val p = plan("tx_curate_full")
    assert(!p.contains("CartesianProduct"),
      s"curation pipeline grew a cartesian:\n$p")
    assert(!p.contains("Window"), s"curation pipeline grew a window:\n$p")
    assert(p.contains("minhashslices"),
      s"fuzzy stage lost the fused signature:\n$p")
    assert(p.contains("xxhash64"),
      s"fuzzy verify lost the hashed join keys:\n$p")
  }

  test("minhash signature path carries no shingle explode before the band join") {
    val p = plan("dd_minhash_lsh")
    assert(p.contains("minhashslices") || p.contains("MinHashSlices"),
      s"fused signature expression not planned:\n$p")
    // the only Generate is the document-sized 4-band explode; a shingle
    // explode would show a Generate over transform(sequence(...))
    val gens = p.linesIterator.filter(_.contains("Generate")).toSeq
    assert(gens.nonEmpty && gens.forall(_.contains("explode(array(struct(")),
      s"signature pass still explodes shingles:\n$p")
  }

  test("tx_chunk is a pure generator: zero exchanges, pruned scan") {
    val p = plan("tx_chunk")
    assert(!p.contains("Exchange"), s"chunking grew a shuffle:\n$p")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text") &&
      !read.contains("lang") && !read.contains("source"),
      s"chunk scan reads unreferenced columns:\n$read")
  }

  test("tx_negatives sorts per salted sub-ring, never per source") {
    val p = plan("tx_negatives")
    val parts = p.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(parts.nonEmpty && parts.forall(_.contains("salt")),
      s"window partitioning lost the salt — unbounded per-source sort:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"negative sampling degenerated to a loop join:\n$p")
  }

  test("tx_postings broadcasts the df band, no unfiltered list aggregation") {
    val p = plan("tx_postings")
    assert(p.contains("BroadcastHashJoin"),
      s"df band join is not broadcast:\n$p")
    // the posting-list aggregate (collect_list) must sit above the band
    // join, i.e. appear at most once and never on the full term explosion
    assert("collect_list".r.findAllIn(p).size <= 2, // partial + final
      s"posting lists aggregated more than once:\n$p")
  }

  test("sq_user_seq has no window and a single user-keyed exchange chain") {
    val p = plan("sq_user_seq")
    assert(!p.contains("Window"), s"sequence build grew a window sort:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"sequence build grew extra exchanges:\n$p")
  }

  test("ann_ivf_disk probes the stored index via dynamic partition pruning") {
    val p = plan("ann_ivf_disk")
    assert(p.contains("dynamicpruning"),
      s"probe scan reads all inverted lists — no runtime partition pruning:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$p")
  }

  test("src_partitioned_prune plans a PartitionFilter, not a data filter") {
    val p = plan("src_partitioned_prune")
    assert(p.contains("PartitionFilters: [") &&
      p.linesIterator.filter(_.contains("PartitionFilters"))
        .exists(_.contains("event_type")),
      s"event_type filter did not become a partition filter:\n$p")
  }

  test("q34_lateral decorrelates: ranked window join, no per-row rescans") {
    val p = plan("q34_lateral")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"lateral subquery did not decorrelate:\n$p")
    // the per-order LIMIT 2 becomes one rank computation over lineitem
    assert(p.contains("Window") || p.contains("WindowGroupLimit"),
      s"no ranked rewrite of the lateral LIMIT:\n$p")
    assert("FileScan parquet".r.findAllIn(p).size <= 2,
      s"lateral rescans a table:\n$p")
  }

  test("q31_range_frame is one user-keyed exchange plus one window") {
    val p = plan("q31_range_frame")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"range frame grew extra exchanges:\n$p")
    assert("Window".r.findAllIn(p).size >= 1)
  }

  test("aj_pit_features runs on the custom as-of operator") {
    val p = plan("aj_pit_features")
    assert(p.contains("AsOfJoin"),
      s"point-in-time join fell back off AsOfJoinExec:\n$p")
  }

  test("ft_training_matrix composes the custom as-of, a range frame, " +
    "and a broadcast vector join in one plan") {
    val p = plan("ft_training_matrix")
    assert(p.contains("AsOfJoin"), s"PIT feature lost the custom op:\n$p")
    assert(p.contains("RANGE BETWEEN") || p.contains("specifiedwindowframe")
      || p.contains("Window"), s"behavioral feature lost its frame:\n$p")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"embedding join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("sk_hll_users sketches in the partial-aggregate phase") {
    val p = plan("sk_hll_users")
    // TypedImperativeAggregate plans as ObjectHashAggregate with a
    // partial phase — registers merge map-side, the 100 TB property
    assert(p.contains("ObjectHashAggregate"),
      s"HLL aggregate not object-hash planned:\n$p")
    assert(p.contains("partial_hll_registers") ||
      p.contains("hll_registers"), s"custom aggregate missing:\n$p")
  }

  test("ab_chisq / ab_welch / ab_cuped fold in one events scan each") {
    for (q <- Seq("ab_chisq", "ab_welch", "ab_cuped")) {
      val p = plan(q)
      val scans = p.linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains("events"))
      assert(scans == 1, s"$q expected 1 events scan, got $scans:\n$p")
      assert(p.contains("HashAggregate"), s"$q lost partial aggregation")
      assert(!p.contains("CartesianProduct"), s"$q grew a cartesian")
    }
  }

  test("ts_backtest and ts_autocorr reuse the cached series, no rescans") {
    for (q <- Seq("ts_backtest", "ts_autocorr")) {
      val p = plan(q)
      assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
        s"$q recomputes the series instead of reusing it:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q grew a cartesian:\n$p")
    }
  }

  test("sq_attribution joins on the user key with bounded windows") {
    val p = plan("sq_attribution")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"),
      s"attribution degenerated to an unbounded join:\n$p")
    assert(p.contains("Window"), "first/last ranking lost its window")
    assert(p.contains("hashpartitioning(user_id") ||
      p.contains("user_id"), s"join not keyed on user:\n$p")
  }

  // NOTE on cached-scan counting: the plan STRING re-prints the cached
  // subtree under every InMemoryRelation reference, so a raw FileScan line
  // count overcounts — each reference EXECUTES the scan zero times after
  // the first materialization. The guard therefore asserts that every
  // reuse goes through InMemoryTableScan, which is the runtime property.

  test("tx_collocations broadcasts the unigram sides over the cached corpus") {
    val p = plan("tx_collocations")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 3,
      s"tokenized corpus / unigram table not reused via cache:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"unigram joins not broadcast:\n$p")
  }

  test("dq_skew folds the globals from the cached histogram") {
    val p = plan("dq_skew")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
      s"histogram not reused for the global fold:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "the 1-row global fold must broadcast, not shuffle")
  }

  test("vec_pca_power: iteration folds driver-side over the d²-bounded Gram") {
    // the one data-sized pass (the Gram aggregation) runs at BUILD time;
    // the returned relation is the 64-row iterate table — a LocalTableScan,
    // proof the d²-bounded value iteration never became distributed jobs
    val p = plan("vec_pca_power")
    assert(p.contains("LocalTableScan"),
      s"expected the driver-folded iterate table:\n$p")
    assert(!p.contains("Join"),
      s"no join may survive the driver fold:\n$p")
  }

  test("dq_referential: anti-joins on collapsed keys, no window, no cartesian") {
    val p = plan("dq_referential")
    assert(p.contains("LeftAnti"), s"orphan check lost its anti-join:\n$p")
    assert(!p.contains("Window"), "audit must not window")
    assert(!p.contains("CartesianProduct"))
  }

  test("ft_leakage_audit computes both feature variants join-free") {
    val p = plan("ft_leakage_audit")
    assert(p.contains("Window"), s"expected the windowed PIT pass:\n$p")
    assert(!p.contains("Join"),
      s"the one-pass audit grew a join:\n$p")
  }

  test("q36_cdc_apply: delta replay is anti-join + union over cached delta") {
    val p = plan("q36_cdc_apply")
    assert(p.contains("LeftAnti"), s"untouched-row passthrough lost:\n$p")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
      s"delta not cached across its two references:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("ts_anomaly: both rank selections read the cached series") {
    val p = plan("ts_anomaly")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
      s"series/deviation relations not reused via cache:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "scalar med/mad folds must broadcast, not shuffle")
  }

  test("gr_assortativity: degree joins hash on the edge keys, no cartesian") {
    val p = plan("gr_assortativity")
    assert(!p.contains("CartesianProduct"), s"assortativity went cartesian:\n$p")
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("BroadcastHashJoin"), s"degree joins missing:\n$p")
  }

  test("vec_matryoshka: one broadcast corpus pass feeds both rankings") {
    val p = plan("vec_matryoshka")
    assert(!p.contains("CartesianProduct"))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1,
      s"expected exactly the one query-stratum broadcast:\n$p")
    assert("Window".r.findAllIn(p).size >= 2,
      s"both rank windows must ride the same joined relation:\n$p")
  }

  test("geo_knn_join: candidates stay an equi-join, argmin windows per point") {
    val p = plan("geo_knn_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"stencil join degenerated:\n$p")
    assert(p.contains("Window"))
  }

  test("sq_basket_lift: pair generation joins on the order key only") {
    val p = plan("sq_basket_lift")
    assert(!p.contains("CartesianProduct"), s"basket join went cartesian:\n$p")
    assert(!p.contains("Window"), "basket mining must not window")
  }

  test("dd_lsh_tuning and sq_markov_removal avoid cartesians") {
    for (q <- Seq("dd_lsh_tuning", "sq_markov_removal")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
    }
    // sq_markov_removal now folds its states²-bounded value iteration
    // driver-side: the returned relation must be the 5-row local table
    assert(plan("sq_markov_removal").contains("LocalTableScan"),
      "expected the driver-folded variant table")
  }

  test("degenerate-input contracts push their not-null predicates to the scan") {
    // the time-ordered contract (ts IS NOT NULL) and the NULL-vector
    // contract (embedding IS NOT NULL) must be FREE at scale: pushed
    // into the parquet scan, not a post-scan residual filter only
    val mk = plan("sq_markov")
    assert(mk.contains("IsNotNull(ts)"),
      s"ts not-null predicate not pushed:\n$mk")
    val vg = plan("vec_gram")
    assert(vg.contains("IsNotNull(embedding)"),
      s"embedding not-null predicate not pushed:\n$vg")
  }

  test("marker-row densification adds no exchange to the pixel pipeline") {
    // tilesFromPixels unions one marker row per grid cell INTO the
    // existing groupByKey shuffle; a second exchange would mean the
    // densify grew its own stage
    val p = plan("px_segment")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2,
      s"px_segment grew extra exchanges ($exchanges):\n$p")
  }

  test("lo_hilbert: index fused into the scan projection, 1 exchange, no join") {
    val p = plan("lo_hilbert")
    // the curve index must be a plain projected expression over the pruned
    // scan (codegen fuses it at runtime; AQE's pre-execution string hides
    // the WholeStageCodegen markers) — never a join or extra stage
    assert(p.contains("hilbertindex("), s"expression not planned natively:\n$p")
    assert(!p.contains("Join"), s"pure layout pass must not join:\n$p")
    assert("Exchange".r.findAllIn(p).size <= 1,
      s"layout pass is one aggregate exchange:\n$p")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && !read.contains("l_quantity"),
      s"scan not pruned to the two key columns:\n$read")
  }

  test("ft_epoch_shuffle windows on (epoch, shard), never a global sort") {
    val p = plan("ft_epoch_shuffle")
    // the only exchanges are the (epoch, shard) window partitioning and
    // the final group-by — no range partitioning (a global sort would
    // serialize the corpus through one ordering)
    assert(!p.contains("rangepartitioning"), s"global sort crept in:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"epoch fan-out must broadcast the 2-row epochs side:\n$p")
  }

  test("lo_hscan pushes the hilbert interval cover into the parquet scan") {
    val p = plan("lo_hscan")
    // the OR'd index ranges must reach PushedFilters (that's the entire
    // point of the layout: min/max stats answer them before any page
    // read); the plan string truncates the tree, so assert the OR chain
    // follows the box's not-null filters inside the pushed list
    val pushed = p.linesIterator.find(_.contains("PushedFilters"))
      .getOrElse("")
    assert(pushed.contains("PushedFilters: [IsNotNull(x), IsNotNull(y), Or("),
      s"hilbert interval cover not pushed:\n$pushed")
    assert(!p.contains("Join"), s"pruned scan must not join:\n$p")
  }

  test("sq_hazard: one data-sized shuffle, the rest lifetime-domain-sized") {
    val p = plan("sq_hazard")
    // user collapse (data-sized) + k collapse + the single-partition
    // window over the tiny lifetime domain — nothing else
    val n = "Exchange".r.findAllIn(p).size
    assert(n <= 3, s"hazard table grew to $n exchanges:\n$p")
    assert(!p.contains("Join"), s"hazard table must not join:\n$p")
  }

  test("ab_power is one grouped aggregate: no join, minimal exchange") {
    val p = plan("ab_power")
    assert(!p.contains("Join"), s"design calculator must not join:\n$p")
    assert("Exchange".r.findAllIn(p).size <= 1,
      s"expected the single aggregate exchange:\n$p")
  }

  test("q41_topk_agg: no window, no sort — bounded-buffer aggregation only") {
    val p = plan("q41_topk_agg")
    assert(!p.contains("Window"), s"top-k degraded to a window:\n$p")
    assert(!p.contains("Sort"), s"top-k is sorting the losers:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"expected the typed aggregate:\n$p")
    assert(p.contains("partial_topk_pairs"),
      s"map-side partial aggregation lost:\n$p")
  }

  test("dq_outliers broadcasts the group-sized med/mad relations") {
    // three BHJ instances: the dev subtree (events ⋈ med) appears once on
    // the probe side and again inside mad's aggregation — a deliberate
    // recompute (stateless scans) rather than caching a data-sized
    // relation; every join build side is a group-sized median relation
    val p = plan("dq_outliers")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj == 3, s"expected 3 broadcast joins, got $bhj:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"group-sized side degenerated to SMJ:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n$p")
  }
}
