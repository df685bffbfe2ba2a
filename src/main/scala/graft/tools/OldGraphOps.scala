package graft.tools
import graft.rel._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational graph operators for the dedup pipeline. */
object OldGraphOps {

  /** Connected components by Pregel-style min-label propagation with a
    * pointer-doubling hop: every round each vertex takes the minimum of its
    * own label, its label's label (comp of comp — collapses chains in
    * O(log diameter) rounds), and its neighbors' labels. Rounds end when a
    * pass changes nothing; the fixpoint assigns every vertex the minimum
    * vertex id of its component.
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
    * `vertices` must have a `doc_id` column; `edges` columns `id_a, id_b`
    * (undirected; mirrored internally). Output: (doc_id, comp).
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist() // scanned every round; released after the result's action
    // Only EDGE-TOUCHED vertices enter the fixpoint: an isolated vertex is
    // its own component and can never change, so at corpus scale (where the
    // overwhelming majority of documents touch no near-dup edge) the
    // iteration runs over the small connected subgraph, not the corpus.
    // The seed folds one neighbor-min pass into initialization.
    val seed = sym.groupBy(col("src").as("doc_id"))
      .agg(least(first(col("src")), min(col("dst"))).as("comp"))
    var labels = { // materialize the seed through the RDD layer (see above)
      val rdd = seed.as[(Long, Long)].rdd
      rdd.localCheckpoint(); rdd.count()
      rdd.toDF("doc_id", "comp")
    }
    var changed = 1L
    while (changed > 0) {
      // two pointer-doubling hops (comp := min(comp, comp of comp), twice),
      // then the neighbor-min pass — chains collapse in O(log diameter)
      // rounds and each round is ONE Spark action: the changed-count rides
      // the same job that materializes the checkpointed blocks
      val hop1 = labels
        .join(labels.select(col("comp").as("hc1"), col("doc_id").as("hd1")),
          col("comp") === col("hd1"), "left")
        .select(col("doc_id"), least(col("comp"), col("hc1")).as("comp"))
      val hop2 = hop1
        .join(hop1.select(col("comp").as("hc2"), col("doc_id").as("hd2")),
          col("comp") === col("hd2"), "left")
        .select(col("doc_id"), least(col("comp"), col("hc2")).as("comp"))
      val next = hop2
        .join(sym, col("doc_id") === col("src"), "left")
        .join(hop2.select(col("doc_id").as("nd"), col("comp").as("ncomp")),
          col("dst") === col("nd"), "left")
        .groupBy("doc_id")
        .agg(least(first(col("comp")), min(col("ncomp"))).as("comp"))
      val flagged = next
        .join(labels.select(col("doc_id").as("od"), col("comp").as("oc")),
          col("doc_id") === col("od"))
        .select(col("doc_id"), col("comp"), (col("comp") =!= col("oc")).as("chg"))
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
