package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler: times one query (by gate name) from
  * `SparkEntry.queries` N times on a bench-identical session and prints
  * per-run seconds. Usage: runMain graft.tools.PerfProbe <name> [n] [sfDir]
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
    val sfDir =
      if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Per-job wall times: where the stages actually go.
    val jobs = new scala.collection.mutable.ArrayBuffer[(Int, Long, Int)]()
    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, Int)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts(e.jobId) = (e.time, e.stageInfos.map(_.numTasks).sum)
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.remove(e.jobId).foreach { case (t0, nt) =>
          jobs.synchronized { jobs += ((e.jobId, e.time - t0, nt)) }
        }
    })
    val fn = graft.SparkEntry.queries(name)
    (1 to n).foreach { i =>
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      val c = fn(spark, sfDir).count()
      graft.runner.Materialize.releaseAll()
      val dt = (System.nanoTime() - t0) / 1e9
      val jl = jobs.synchronized(jobs.toList).sortBy(_._1)
        .map { case (id, ms, nt) => s"j$id:${ms}ms/${nt}t" }.mkString(" ")
      println(f"[probe] $name run$i: $dt%.3f s rows=$c  $jl")
    }
    spark.stop()
  }
}
