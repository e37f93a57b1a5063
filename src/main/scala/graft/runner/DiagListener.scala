package graft.runner

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Global (not per-job-group) robustness counters for the bench sweep
  * (round-8 VERDICT "Next #1"): BENCH_r08 recorded a 55x wall-time
  * collapse on the cache-heavy queries that only an environment with
  * storage-memory pressure reproduces — wall time alone cannot explain
  * itself. These three task-metric sums (memory/disk spill, task-side GC)
  * are exactly the evidence that distinguishes "code got slower" from
  * "cache got evicted and recomputed": under pressure the spill columns
  * light up while a healthy run reads zero.
  */
class DiagListener extends SparkListener {

  private val memSpilled = new AtomicLong(0L)
  private val diskSpilled = new AtomicLong(0L)
  private val gcTimeMs = new AtomicLong(0L)

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      memSpilled.addAndGet(m.memoryBytesSpilled)
      diskSpilled.addAndGet(m.diskBytesSpilled)
      gcTimeMs.addAndGet(m.jvmGCTime)
    }
  }

  case class Snapshot(memSpilled: Long, diskSpilled: Long, gcTimeMs: Long) {
    def -(prev: Snapshot): Snapshot = Snapshot(
      memSpilled - prev.memSpilled,
      diskSpilled - prev.diskSpilled,
      gcTimeMs - prev.gcTimeMs)
  }

  def snapshot(): Snapshot =
    Snapshot(memSpilled.get(), diskSpilled.get(), gcTimeMs.get())
}
