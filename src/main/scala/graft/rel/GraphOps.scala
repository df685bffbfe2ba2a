package graft.rel



import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._


/** Relational graph operators for the dedup pipeline. */
object GraphOps {

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
