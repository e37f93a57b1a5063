package graft.runner

import org.apache.spark.scheduler._
import scala.collection.concurrent.TrieMap

/** In-process task-metric accumulation per job group — replaces the
  * reference's four-source metric harvest (REST polling with task dedup,
  * eventlog 2-pass parse, run_queries.py:251-548) with a SparkListener:
  * strictly better (no HTTP, no files, no dedup races) and identical
  * numbers, since both read TaskEnd metrics.
  */
class MetricsListener extends SparkListener {

  case class GroupMetrics(
      var bytesRead: Long = 0L,
      var recordsRead: Long = 0L,
      var executorRunTimeMs: Long = 0L,
      var executorCpuTimeNs: Long = 0L,
      var tasks: Int = 0)

  private val stageToGroup = TrieMap.empty[Int, String]
  private val groups = TrieMap.empty[String, GroupMetrics]

  override def onJobStart(e: SparkListenerJobStart): Unit = {
    val group = Option(e.properties)
      .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
      .getOrElse("")
    e.stageIds.foreach(stageToGroup(_) = group)
  }

  // Bound state: a stage's mapping is dead once the stage completes
  // (its TaskEnd events have already been delivered — the bus is FIFO).
  override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
    stageToGroup.remove(e.stageInfo.stageId)

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val group = stageToGroup.getOrElse(e.stageId, "")
    if (group.nonEmpty && e.taskMetrics != null) {
      val g = groups.getOrElseUpdate(group, GroupMetrics())
      g.synchronized {
        g.bytesRead += e.taskMetrics.inputMetrics.bytesRead
        g.recordsRead += e.taskMetrics.inputMetrics.recordsRead
        g.executorRunTimeMs += e.taskMetrics.executorRunTime
        g.executorCpuTimeNs += e.taskMetrics.executorCpuTime
        g.tasks += 1
      }
    }
  }

  def snapshot(group: String): GroupMetrics =
    groups.getOrElse(group, GroupMetrics())

  def reset(group: String): Unit = groups.remove(group)
}
