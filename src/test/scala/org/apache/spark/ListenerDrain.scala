package org.apache.spark

/** Test-only bridge into `private[spark]` listener-bus draining: byte-budget
  * specs must observe EVERY task's metrics before reading their counters,
  * and a fixed sleep is both slow and racy — a slow listener bus truncates
  * the count, a fast one wastes wall-clock. `waitUntilEmpty` blocks until
  * the bus has dispatched all posted events (10 s default timeout).
  */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
