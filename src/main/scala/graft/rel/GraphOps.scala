package graft.rel

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Relational graph operators for the dedup pipeline. */
object GraphOps {

  /** Connected components by Pregel-style min-label propagation with
    * pointer-doubling hops: every round each vertex takes the minimum of
    * its own label, its label's label (comp of comp — collapses chains in
    * O(log diameter) rounds, applied twice per round), and its neighbors'
    * labels. The fixpoint assigns every vertex the minimum vertex id of its
    * component.
    *
    * The fixpoint deliberately runs on co-partitioned RDDs, not DataFrames
    * — the one place in the engine where the RDD layer is the *right*
    * abstraction, for the same reasons GraphX uses it:
    *
    *  - **Edges shuffle once.** `sym` is hash-partitioned by source vertex
    *    up front; every round's neighbor join is then a narrow
    *    co-partitioned join. The DataFrame formulation re-exchanged both
    *    join sides every round — at 100 TB the edge relation is the big
    *    one, and re-shuffling it per round IS the bottleneck.
    *  - **No per-round query planning.** Each DataFrame round pays
    *    analysis + optimization + codegen on a fresh plan (hundreds of ms
    *    while the per-round data is tiny), and an iterative self-join plan
    *    doubles per round if merely persisted — analysis cost goes
    *    exponential while the data stays tiny (measured 248s -> 10s at
    *    harness scale), and `Dataset.localCheckpoint` preserves the
    *    checkpointed plan's STATISTICS, so join-size estimates compound
    *    4^rounds into million-digit BigInts. The RDD loop has no plan to
    *    double: each round is a fixed DAG of narrow joins plus tiny
    *    label-sized exchanges, one job, with `localCheckpoint` truncating
    *    lineage.
    *
    * Only EDGE-TOUCHED vertices enter the fixpoint: an isolated vertex is
    * its own component and can never change, so at corpus scale (where the
    * overwhelming majority of documents touch no near-dup edge) the
    * iteration runs over the small connected subgraph, not the corpus.
    *
    * `vertices` must have a `doc_id` column; `edges` columns `id_a, id_b`
    * (undirected; mirrored internally). Output: (doc_id, comp).
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._
    val part = new HashPartitioner(
      math.max(1, spark.sparkContext.defaultParallelism))

    // mirror + partition by source ONCE; persisted for every round's
    // narrow neighbor join, released before returning
    val sym: RDD[(Long, Long)] = edges
      .select(col("id_a"), col("id_b")).as[(Long, Long)].rdd
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // seed folds one neighbor-min pass into initialization; reduceByKey
    // over the pre-partitioned edges is narrow
    var labels: RDD[(Long, Long)] = sym
      .reduceByKey(part, math.min(_: Long, _: Long))
      .mapPartitions(_.map { case (v, m) => (v, math.min(v, m)) },
        preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.localCheckpoint()
    labels.count()

    // comp := min(comp, comp(comp)): re-key by comp (tiny label-sized
    // shuffle), narrow-join against the labels themselves, re-key back
    def hop(l: RDD[(Long, Long)]): RDD[(Long, Long)] = l
      .map { case (d, c) => (c, d) }
      .partitionBy(part)
      .leftOuterJoin(l, part)
      .map { case (c, (d, cc)) => (d, math.min(c, cc.getOrElse(c))) }
      .partitionBy(part)

    var changed = 1L
    while (changed > 0) {
      val doubled = hop(hop(labels))
      // neighbor-min messages: comp(u) -> v for each edge (u, v); the
      // labels side of the join is narrow against the persisted edges
      val msgs = doubled.join(sym, part)
        .map { case (_, (c, v)) => (v, c) }
        .reduceByKey(part, math.min(_: Long, _: Long))
      val next = doubled.leftOuterJoin(msgs, part)
        .mapValues { case (c, m) => math.min(c, m.getOrElse(c)) }
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.localCheckpoint()
      // ONE job materializes the round AND counts changes: the old labels
      // are co-partitioned with next, so the comparison join is narrow
      changed = labels.join(next, part)
        .filter { case (_, (o, n)) => o != n }.count()
      labels.unpersist(blocking = false)
      labels = next
    }

    val fixed = labels.toDF("doc_id", "comp")
    val untouched = vertices.select(col("doc_id"))
      .join(fixed.select(col("doc_id").as("td")), col("doc_id") === col("td"),
        "left_anti")
      .select(col("doc_id"), col("doc_id").as("comp"))
    val out = fixed.unionByName(untouched)
    // release the round state after the caller's terminal action
    graft.Caching.releaseAfterActionRdd(out, Seq(sym, labels))
  }
}
