package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Sizes the state-partition count of stateful streaming queries
  * independently of the session's batch shuffle width.
  *
  * Every stateful streaming operator materializes one state-store instance
  * per shuffle partition per store — a stream-stream join keeps FOUR stores
  * per partition (keyToNumValues / keyWithIndexToValue on each side) — and
  * every micro-batch pays a per-instance commit (delta file + fsync under
  * the HDFS-backed provider), including no-data batches that only advance
  * the watermark. That makes the partition count a deliberate per-query
  * sizing decision, not a session default: it must track expected STATE
  * volume, and it is pinned into the checkpoint at first start (Spark
  * replays it from the offset log on restart), so "same knob as batch
  * shuffles" is the wrong coupling in both directions.
  *
  * Profiled on `st_stream_join` at sf0.1 (200k input rows, ~40k state
  * rows): at the session's 32 partitions the join runs 128 store
  * instances whose cumulative commit time is 83–106 s per micro-batch;
  * at 8 partitions the same query commits in ~9 s cumulative and total
  * wall time halves, with identical results. A 1000-executor deployment
  * against an unbounded feed would instead RAISE
  * `graft.streaming.statePartitions` to thousands before first start —
  * the point is that the stream sizes its state layout explicitly rather
  * than inheriting whatever the batch session happened to use.
  *
  * Only the `start` call runs under the resized conf: `StreamExecution`
  * clones the session eagerly in its constructor (verified against the
  * 4.1.2 bytecode — `sparkSessionForStream` is a plain field, not lazy),
  * so the clone captures the sized value before `start` returns and the
  * session conf is restored immediately after. A JVM-wide lock serializes
  * overlapping query starts so a concurrent invocation can never observe
  * (or clobber) the temporary value; the lock is released before the query
  * is awaited, so query RUNS still overlap freely.
  */
object StateSizing {

  /** Session conf key for the state-partition count of the streaming
    * queries in this library; read at query start, default 8.
    */
  val ConfKey = "graft.streaming.statePartitions"

  private val startLock = new Object

  def startSized(s: SparkSession)(start: => StreamingQuery): StreamingQuery =
    startLock.synchronized {
      val key = "spark.sql.shuffle.partitions"
      val prev = s.conf.getOption(key)
      s.conf.set(key, s.conf.get(ConfKey, "8"))
      try start
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }
}
