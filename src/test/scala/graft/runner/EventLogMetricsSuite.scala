package graft.runner

import org.scalatest.funsuite.AnyFunSuite

/** [[EventLogMetrics]] (M5): per-group aggregation over the standard
  * JSON-lines event-log shape. Field names pinned against a real Spark
  * 4.1.2 log via tools/EventLogProbe (live listener == parsed log).
  */
class EventLogMetricsSuite extends AnyFunSuite {

  private def taskEnd(stage: Int, bytes: Long, records: Long, runMs: Long,
      cpuNs: Long, gcMs: Long, memSpill: Long, diskSpill: Long): String =
    s"""{"Event":"SparkListenerTaskEnd","Stage ID":$stage,"Stage Attempt ID":0,""" +
      s""""Task Type":"ResultTask","Task End Reason":{"Reason":"Success"},""" +
      s""""Task Metrics":{"Executor Run Time":$runMs,"Executor CPU Time":$cpuNs,""" +
      s""""JVM GC Time":$gcMs,"Memory Bytes Spilled":$memSpill,""" +
      s""""Disk Bytes Spilled":$diskSpill,""" +
      s""""Input Metrics":{"Bytes Read":$bytes,"Records Read":$records}}}"""

  private def jobStart(job: Int, stages: Seq[Int], group: Option[String]): String = {
    val props = group.map(g => s""""spark.jobGroup.id":"$g"""").getOrElse("")
    s"""{"Event":"SparkListenerJobStart","Job ID":$job,""" +
      s""""Stage IDs":[${stages.mkString(",")}],"Properties":{$props}}"""
  }

  test("per-group aggregation, ungrouped jobs under empty key, junk lines skipped") {
    val log = Seq(
      """{"Event":"SparkListenerApplicationStart","App Name":"x"}""",
      jobStart(0, Seq(0, 1), Some("q1")),
      taskEnd(0, 100, 10, 5, 5000000, 1, 0, 0),
      taskEnd(0, 200, 20, 7, 7000000, 0, 64, 32),
      taskEnd(1, 50, 5, 3, 3000000, 0, 0, 0),
      jobStart(1, Seq(2), Some("q2")),
      taskEnd(2, 1000, 100, 11, 1000, 2, 0, 0),
      jobStart(2, Seq(3), None), // no group -> ""
      taskEnd(3, 7, 1, 1, 1, 0, 0, 0),
      """not json at all""",
      """{"Event":"SparkListenerStageCompleted","Stage Info":{"Stage ID":0}}""")
    val dir = java.nio.file.Files.createTempDirectory("graft_elog_")
    val f = dir.resolve("app-1")
    java.nio.file.Files.write(f,
      log.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))

    val m = EventLogMetrics.parse(f.toString)
    val q1 = m("q1")
    assert(q1.bytesRead == 350 && q1.recordsRead == 35 && q1.tasks == 3)
    assert(q1.executorRunTimeMs == 15 && q1.executorCpuTimeNs == 15000000)
    assert(q1.gcTimeMs == 1 && q1.memorySpilledBytes == 64 &&
      q1.diskSpilledBytes == 32)
    val q2 = m("q2")
    assert(q2.bytesRead == 1000 && q2.tasks == 1)
    assert(m("").bytesRead == 7 && m("").tasks == 1)

    // directory form (rolled logs): same totals
    val m2 = EventLogMetrics.parse(dir.toString)
    assert(m2("q1") == q1 && m2("q2") == q2)
  }
}
