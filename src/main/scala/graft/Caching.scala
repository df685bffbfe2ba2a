package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Pairs every `persist()` with a guaranteed release, without breaking the
  * lazy query contract (builders return unmaterialized DataFrames; the
  * action happens in the caller).
  *
  * `releaseAfterAction(result, deps*)` persists the deps and registers a
  * one-shot listener that unpersists them as soon as any action whose plan
  * contains `result` completes (success OR failure) — so a long-lived
  * session embedding these queries cannot accumulate cached blocks across
  * invocations, which previously relied on the harness calling
  * `clearCache()` between queries. If the result is materialized twice, the
  * second run recomputes (correct, just uncached) — each fresh builder
  * invocation re-registers its own cache + release.
  *
  * Caveat: a result that is BUILT but never materialized (plan-inspection
  * only) keeps its deps cached and its listener registered until either the
  * session ends or something drops the cache; the listener self-prunes as
  * soon as it observes its deps uncached (e.g. after a `clearCache()`), so
  * harness loops that clear between queries cannot accumulate stale
  * listeners.
  */
object Caching {

  // NOTE on a measured-and-rejected variant (optimization round 18): lazy
  // persistence does NOT fully deduplicate work when the same cached
  // relation feeds several independent subtrees of one action — AQE
  // materializes independent query stages CONCURRENTLY and the block
  // manager's getOrCompute has no in-flight dedup, so racing stages
  // recompute the cached plan until the first blocks land (profiled on
  // dd_lsh_recall: 120 s cumulative task time for ~45 s of distinct
  // work). An `eager(dep)` helper (persist + count before consumers are
  // built) removed the duplication but LOST wall-time in quiet A/B on all
  // 12 gates tried (geomean ~1.09x, gr_kcore 1.61x): the extra job
  // barriers serialize work that 32 idle cores absorb for free at this
  // data size. At cluster scale with saturated executors the trade
  // reverses — revisit there, not here.

  def releaseAfterAction[T](result: Dataset[T], deps: Dataset[_]*): Dataset[T] = {
    deps.foreach(_.persist())
    val spark = result.sparkSession
    val target = result.queryExecution.analyzed
    val released = new java.util.concurrent.atomic.AtomicBoolean(false)
    object listener extends QueryExecutionListener {
      private def maybeRelease(qe: QueryExecution): Unit = {
        // self-prune when something else (clearCache) already dropped the
        // deps — the release would be a no-op but the listener must go
        val alreadyDropped = deps.forall(
          _.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        // a conservative matcher failure must release rather than leak
        val hit = alreadyDropped ||
          (try qe.analyzed.exists(_.sameResult(target))
           catch { case _: Throwable => true })
        if (hit && released.compareAndSet(false, true)) {
          deps.foreach(_.unpersist(blocking = false))
          spark.listenerManager.unregister(listener)
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = maybeRelease(qe)
    }
    spark.listenerManager.register(listener)
    result
  }
}
