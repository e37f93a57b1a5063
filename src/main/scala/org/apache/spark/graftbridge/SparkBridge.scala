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

  /** Broadcast blocks currently in the local block manager, name → bytes
    * (memory + disk). Local mode only; lets suites probe how much a code
    * path actually broadcast (KeyIndexSuite's O(batch)-lookup assertion).
    */
  def broadcastBlocks(sc: SparkContext): Map[String, Long] = {
    val bm = org.apache.spark.SparkEnv.get.blockManager
    bm.getMatchingBlockIds(_.isBroadcast).flatMap { id =>
      bm.getStatus(id).map(s => id.name -> (s.memSize + s.diskSize))
    }.toMap
  }
}
