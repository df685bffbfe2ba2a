package graft.rel



import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._


/** Relational graph operators for the dedup pipeline. */
object GraphOps {

  /** Session conf key: edge-count cap (PAIRS, pre-mirroring) below which
    * the component labeling collapses to a driver-side union-find instead
    * of the distributed fixpoint. Default 1M pairs (~30 MB transient on
    * the driver) — a runtime-bounded round-trip in the AQE spirit
    * (decide the physical strategy from the observed size): at harness
    * scale the near-dup edge sets are 10³-10⁵ pairs, and ~4 fixpoint
    * rounds × 4 jobs of pure scheduling cost an order of magnitude more
    * than the exact same min-id labeling computed in milliseconds on the
    * driver (measured: dd_phash_clusters' 537k-edge mirror labels in
    * ~0.9 s vs 3.7 s through the fixpoint). Set 0 to force the
    * distributed path (the ComponentsScale probe does, so the fixpoint
    * shapes stay measurable); above the cap the Tungsten fixpoint runs
    * unchanged — the billions-of-pairs 100 TB path.
    */
  val DriverCapKey = "graft.graph.componentsDriverMaxEdges"

  /** Driver union-find over the mirrored edge list: same output contract
    * as the fixpoint — every edge-touched vertex labeled with the MINIMUM
    * vertex id of its component.
    */
  private def driverComponents(sym: Array[(Long, Long)]): Array[(Long, Long)] = {
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    sym.foreach { case (a, b) =>
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    val it = parent.keySet().iterator()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    while (it.hasNext) { val v = it.next(); out += ((v, find(v))) }
    out.toArray
  }

  /** Connected components by Pregel-style min-label propagation with
    * pointer-doubling hops: every round each vertex takes the minimum of
    * its own label, its label's label (comp of comp — collapses chains in
    * O(log diameter) rounds, applied twice per round), and its neighbors'
    * labels. The fixpoint assigns every vertex the minimum vertex id of its
    * component.
    *
    * Every round truncates lineage through the RDD layer: an iterative
    * fixpoint whose rounds self-join the previous result doubles its
    * LOGICAL PLAN per round if merely persisted — analysis cost goes
    * exponential while the data stays tiny (measured 248s -> 10s at harness
    * scale). `Dataset.localCheckpoint` is NOT enough: it preserves the
    * checkpointed plan's STATISTICS, so join-size estimates compound
    * 4^rounds into million-digit BigInts and the stats visitor hangs in
    * BigInteger.multiply. Round-tripping `df.rdd.localCheckpoint()` resets
    * both lineage and stats; blocks are reclaimed by the ContextCleaner as
    * references drop.
    *
    * Round shape (round 5 tightened it from 5 joins to 3 + one agg): the
    * PRE-ROUND component rides along as `oc` so the change count needs no
    * extra comparison join, and the neighbor-min pass is one inner
    * edges-join producing messages union'd with the self rows into a
    * single min-aggregate — two fewer shuffles per round than the r4
    * formulation, with identical semantics. (A co-partitioned RDD fixpoint
    * — the GraphX shape, edges shuffled exactly once — was measured on the
    * differential probe `tools/ComponentsScale` and LOST ~1.5x to this
    * Tungsten formulation at harness scale: RDD tuple shuffles pay Java
    * serialization while every exchange here stays in Tungsten binary.
    * The probe keeps both shapes honest if the tradeoff shifts at cluster
    * scale.)
    *
    * Only EDGE-TOUCHED vertices enter the fixpoint: an isolated vertex is
    * its own component and can never change, so at corpus scale (where the
    * overwhelming majority of documents touch no near-dup edge) the
    * iteration runs over the small connected subgraph, not the corpus.
    * The seed folds one neighbor-min pass into initialization.
    *
    * `vertices` must have a `doc_id` column; `edges` columns `id_a, id_b`
    * (undirected; mirrored internally). Output: (doc_id, comp).
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist() // scanned every round; released after the result's action
    // the mirror count doubles as the size probe for the strategy choice
    // (it materializes the cache the seed pass reuses either way)
    val nSym = sym.count()
    val cap = spark.conf.getOption(DriverCapKey).map(_.toLong).getOrElse(1000000L)
    if (nSym <= 2 * cap) {
      val labels = driverComponents(
        sym.as[(Long, Long)].collect()).toSeq.toDF("doc_id", "comp")
      val untouched = vertices.select(col("doc_id"))
        .join(labels.select(col("doc_id").as("td")),
          col("doc_id") === col("td"), "left_anti")
        .select(col("doc_id"), col("doc_id").as("comp"))
      return graft.Caching.releaseAfterAction(
        labels.unionByName(untouched), sym)
    }
    val seed = sym.groupBy(col("src").as("doc_id"))
      .agg(least(first(col("src")), min(col("dst"))).as("comp"))
    var labels = { // materialize the seed through the RDD layer (see above)
      val rdd = seed.as[(Long, Long)].rdd
      rdd.localCheckpoint(); rdd.count()
      rdd.toDF("doc_id", "comp")
    }
    var changed = 1L
    while (changed > 0) {
      // two pointer-doubling hops (comp := min(comp, comp of comp), twice)
      // with the pre-round component riding along untouched as `oc`
      val base = labels.select(col("doc_id"), col("comp"),
        col("comp").as("oc"))
      val hop1 = base
        .join(labels.select(col("comp").as("hc1"), col("doc_id").as("hd1")),
          col("comp") === col("hd1"), "left")
        .select(col("doc_id"), least(col("comp"), col("hc1")).as("comp"),
          col("oc"))
      val hop2 = hop1
        .join(hop1.select(col("comp").as("hc2"), col("doc_id").as("hd2")),
          col("comp") === col("hd2"), "left")
        .select(col("doc_id"), least(col("comp"), col("hc2")).as("comp"),
          col("oc"))
      // neighbor-min as messages: comp(u) delivered to v for every edge
      // (u, v), union'd with the self rows into ONE min-aggregate — the
      // self row guarantees every vertex survives and carries its oc
      val msgs = hop2.join(sym, col("doc_id") === col("src"))
        .select(col("dst").as("doc_id"), col("comp"),
          lit(null).cast("long").as("oc"))
      val next = hop2.unionByName(msgs)
        .groupBy("doc_id")
        .agg(min(col("comp")).as("comp"),
          first(col("oc"), ignoreNulls = true).as("oc"))
      val flagged = next.select(col("doc_id"), col("comp"),
        (col("comp") =!= col("oc")).as("chg"))
      val rdd = flagged.as[(Long, Long, Boolean)].rdd
      rdd.localCheckpoint()
      changed = rdd.filter(_._3).count() // materializes AND counts changes
      labels = rdd.map(t => (t._1, t._2)).toDF("doc_id", "comp")
    }
    val untouched = vertices.select(col("doc_id"))
      .join(labels.select(col("doc_id").as("td")), col("doc_id") === col("td"),
        "left_anti")
      .select(col("doc_id"), col("doc_id").as("comp"))
    graft.Caching.releaseAfterAction(labels.unionByName(untouched), sym)
  }
}
