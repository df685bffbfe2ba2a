package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational graph operators for the dedup pipeline. */
object GraphOps {

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
    def truncate(df: DataFrame): DataFrame = {
      val rdd = df.select(col("doc_id"), col("comp")).as[(Long, Long)].rdd
      rdd.localCheckpoint()
      rdd.count() // materialize now; later rounds read the blocks
      rdd.toDF("doc_id", "comp")
    }
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
    var labels = truncate(vertices.select(col("doc_id"), col("doc_id").as("comp")))
    var changed = 1L
    while (changed > 0) {
      val hop = labels
        .join(labels.select(col("comp").as("hc"), col("doc_id").as("hd")),
          col("comp") === col("hd"), "left")
        .select(col("doc_id"), least(col("comp"), col("hc")).as("comp"))
      val next = truncate(hop
        .join(sym, col("doc_id") === col("src"), "left")
        .join(hop.select(col("doc_id").as("nd"), col("comp").as("ncomp")),
          col("dst") === col("nd"), "left")
        .groupBy("doc_id")
        .agg(least(first(col("comp")), min(col("ncomp"))).as("comp"))
        .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("comp")))
      changed = next.as("n")
        .join(labels.as("o"), expr("n.doc_id = o.doc_id AND n.comp != o.comp"))
        .count()
      labels = next
    }
    labels
  }
}
