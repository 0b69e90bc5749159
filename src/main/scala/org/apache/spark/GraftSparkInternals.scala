package org.apache.spark

/** Narrow bridge to `private[spark]` internals needed by graft's
  * benchmark harness (same-package access, the pattern Spark's own test
  * utilities use). Keep this file to exactly one concern: nothing in the
  * engine proper may depend on it. */
object GraftSparkInternals {

  /** Block until the async listener bus has delivered every queued event.
    * Bench reads per-query metrics from a SparkListener immediately after
    * an action returns; stage-completed events are delivered
    * asynchronously, so without a drain the last stages of query N are
    * accumulated into query N+1's window. */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
