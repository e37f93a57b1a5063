package graft.runner

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Post-hoc eventlog metric harvest — the reference's M5 source
  * (lakehouse_op/run_queries.py:203-548 two-pass eventlog parse): a
  * user auditing a FINISHED run has only the Spark event-log file; the
  * in-process [[MetricsListener]] (M4) cannot help there. This parser
  * reads the same TaskEnd metrics from the log and aggregates them per
  * job group, so post-hoc numbers match the live listener's exactly
  * (both sources are the task-end payload).
  *
  * Works on the standard JSON-lines event log written under
  * `spark.eventLog.dir` (uncompressed). Driver-side streaming parse —
  * one pass, O(groups) state, never materializing the log in memory:
  * event logs of long runs reach GBs, but each line is independent.
  *
  * Two-pass semantics folded into one pass: `SparkListenerJobStart`
  * precedes its stages' `SparkListenerTaskEnd`s in the log (the bus is
  * FIFO), so the stage→group map is always populated before use —
  * the same ordering argument [[MetricsListener]] relies on.
  */
object EventLogMetrics {

  case class GroupMetrics(
      bytesRead: Long = 0L,
      recordsRead: Long = 0L,
      executorRunTimeMs: Long = 0L,
      executorCpuTimeNs: Long = 0L,
      gcTimeMs: Long = 0L,
      memorySpilledBytes: Long = 0L,
      diskSpilledBytes: Long = 0L,
      tasks: Int = 0) {
    def +(o: GroupMetrics): GroupMetrics = GroupMetrics(
      bytesRead + o.bytesRead, recordsRead + o.recordsRead,
      executorRunTimeMs + o.executorRunTimeMs,
      executorCpuTimeNs + o.executorCpuTimeNs,
      gcTimeMs + o.gcTimeMs,
      memorySpilledBytes + o.memorySpilledBytes,
      diskSpilledBytes + o.diskSpilledBytes,
      tasks + o.tasks)
  }

  private def jLong(v: JValue): Long = v match {
    case JInt(i) => i.toLong
    case JLong(l) => l
    case JDouble(d) => d.toLong
    case _ => 0L
  }

  /** Parse one event-log file (or a directory) into per-job-group
    * metrics. Directories recurse into Spark 4's default ROLLING layout
    * (`eventlog_v2_<appId>/events_<n>_<appId>` plus zero-length
    * `appstatus_` markers, which are skipped), so both a single app's
    * log dir and a whole `spark.eventLog.dir` parse. Tasks of jobs with
    * no group land under "".
    */
  def parse(path: String): Map[String, GroupMetrics] = {
    val p = java.nio.file.Paths.get(path)
    val files: Seq[java.nio.file.Path] =
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.walk(p, 3)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter { f =>
            val n = f.getFileName.toString
            java.nio.file.Files.isRegularFile(f) &&
              !n.startsWith(".") && !n.startsWith("appstatus_")
          }.toSeq.sortBy(_.toString)
        } finally s.close()
      } else Seq(p)
    val stageToGroup = scala.collection.mutable.Map.empty[Int, String]
    val groups = scala.collection.mutable.Map.empty[String, GroupMetrics]
    files.foreach { f =>
      val reader = java.nio.file.Files.newBufferedReader(
        f, java.nio.charset.StandardCharsets.UTF_8)
      try {
        var line = reader.readLine()
        while (line != null) {
          if (line.contains("SparkListenerJobStart")) {
            val j = JsonMethods.parse(line)
            if ((j \ "Event") == JString("SparkListenerJobStart")) {
              val group = (j \ "Properties" \ "spark.jobGroup.id") match {
                case JString(g) => g
                case _ => ""
              }
              (j \ "Stage IDs") match {
                case JArray(ids) => ids.foreach(id => stageToGroup(jLong(id).toInt) = group)
                case _ => (j \ "Stage Infos") match {
                  case JArray(infos) => infos.foreach(si =>
                    stageToGroup(jLong(si \ "Stage ID").toInt) = group)
                  case _ => ()
                }
              }
            }
          } else if (line.contains("SparkListenerTaskEnd")) {
            val j = JsonMethods.parse(line)
            if ((j \ "Event") == JString("SparkListenerTaskEnd")) {
              val stageId = jLong(j \ "Stage ID").toInt
              val group = stageToGroup.getOrElse(stageId, "")
              val tm = j \ "Task Metrics"
              if (tm != JNothing) {
                val d = GroupMetrics(
                  bytesRead = jLong(tm \ "Input Metrics" \ "Bytes Read"),
                  recordsRead = jLong(tm \ "Input Metrics" \ "Records Read"),
                  executorRunTimeMs = jLong(tm \ "Executor Run Time"),
                  executorCpuTimeNs = jLong(tm \ "Executor CPU Time"),
                  gcTimeMs = jLong(tm \ "JVM GC Time"),
                  memorySpilledBytes = jLong(tm \ "Memory Bytes Spilled"),
                  diskSpilledBytes = jLong(tm \ "Disk Bytes Spilled"),
                  tasks = 1)
                groups(group) = groups.getOrElse(group, GroupMetrics()) + d
              }
            }
          }
          line = reader.readLine()
        }
      } finally reader.close()
    }
    groups.toMap
  }
}
