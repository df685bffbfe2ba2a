package org.apache.spark

/** Main-scope bridge into `private[spark]` listener-bus draining (the test
  * twin lives in test scope as ListenerDrain): metric probes that read
  * task-level counters must see every posted event before sampling, and
  * `waitUntilEmpty` blocks until the bus has dispatched them all — no fixed
  * sleeps, no truncated counts.
  */
object ListenerDrainTool {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
