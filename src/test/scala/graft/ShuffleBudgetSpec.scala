package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-volume regression guards: the scale arguments in the query
  * docstrings ("only margins move", "communication is d² per partition",
  * "candidates only, never all-pairs") asserted as MEASURED byte budgets,
  * not prose. Each bound is ~4× the currently observed volume at
  * sf0.001 — loose enough for partitioning jitter, tight enough that a
  * regression to a data-sized shuffle (the failure mode each docstring
  * rules out) blows through it by orders of magnitude.
  */
class ShuffleBudgetSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private val bytes = new AtomicLong(0)
  private object listener extends SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null)
        bytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  /** Shuffle bytes written while materializing query `name` once. The
    * counter is only meaningful because suites run serially against the
    * shared session (build.sbt `Test / parallelExecution := false`) — a
    * concurrent suite's tasks would land in the same global listener.
    */
  private def shuffleOf(name: String): Long = {
    val sc = spark.sparkContext
    // deterministic drain: no events from before this measurement linger
    org.apache.spark.ListenerDrain.drain(sc)
    sc.addSparkListener(listener)
    try {
      bytes.set(0)
      SparkEntry.queries(name)(spark, sf).count()
      // block until the bus has dispatched every posted event — a fixed
      // sleep either truncates the count (slow bus) or wastes wall-clock
      org.apache.spark.ListenerDrain.drain(sc)
      bytes.get()
    } finally {
      sc.removeSparkListener(listener)
      spark.catalog.clearCache()
    }
  }

  /** (query, byte budget, which docstring claim the budget pins). */
  private val budgets = Seq(
    // two halo exchanges move MARGINS (ov=2 of 12px tiles), never tiles
    ("px_pipeline", 2L << 20, "margins-only halo exchange"),
    // Gram cells: d²·partitions rows, independent of vector count
    ("vec_gram", 4L << 20, "d² per partition accumulator"),
    // LSH: band-bucket candidates only — no all-pairs shuffle
    ("dd_minhash_lsh", 8L << 20, "banded candidates, not all-pairs"),
    // transition matrix: ONE data pass then states²-bounded relations
    ("sq_markov_removal", 8L << 20, "states²-bounded value iteration"),
    // per-tile kernel, no shuffle beyond the one prepare exchange
    ("px_overlap_diag", 2L << 20, "tile-local diagnostic"),
    // TypedImperativeAggregate sketches combine map-side: registers move,
    // never events
    ("sk_hll_users", 1L << 20, "sketch partial aggregation"),
    // bucketed warehouse layout: the join itself is exchange-free; only
    // the final fold's partial rows shuffle
    ("q20_bucketed", 1L << 20, "zero-exchange co-located join"),
    // hash-group dedup: the shuffle carries md5 keys + counts, not text
    ("dd_exact", 4L << 20, "key-sized exact-dedup shuffle"),
    // bounded-buffer top-k: each task ships <= k pairs per group — the
    // shuffle must stay group-count-sized, never event-sized (the window
    // form q7_topk deliberately gates would shuffle every row)
    ("q41_topk_agg", 256L << 10, "k-bounded top-k partial aggregation"))

  for ((q, budget, claim) <- budgets)
    test(s"$q stays under ${budget >> 20} MB of shuffle ($claim)") {
      val b = shuffleOf(q)
      info(s"$q shuffled ${b / 1024} KiB (budget ${budget >> 10} KiB)")
      assert(b <= budget,
        s"$q shuffled $b bytes — the '$claim' shape regressed")
    }
}
