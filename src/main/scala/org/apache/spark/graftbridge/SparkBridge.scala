package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge to `org.apache.spark`-private internals (same technique as the
  * sql-side Bridge): the listener bus is delivered asynchronously, so
  * metric snapshots must drain it first or the last tasks' TaskEnd
  * events are still queued.
  */
object SparkBridge {
  /** Block until queued listener events are delivered (bounded wait). */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
