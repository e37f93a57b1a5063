package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: name every Spark job of one incremental fold. The fold's
  * sub-sf10 margin is bounded by fixed per-job latency (round-11 VERDICT
  * "What's wrong #2"), so cutting jobs needs their call sites first —
  * this prints one line per job (description or call site) with its
  * task count, grouped by the fold's phase markers.
  *
  * Usage: runMain graft.tools.FoldJobs [sfDir]
  */
object FoldJobs {

  class JobLog extends SparkListener {
    val jobs = new scala.collection.mutable.ArrayBuffer[(Int, String, Int)]
    val started = new scala.collection.mutable.HashMap[Int, Long]
    val wall = new scala.collection.mutable.HashMap[Int, Double]
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      // stage names carry the action call site ("count at Foo.scala:12");
      // the job's LAST stage is the action itself
      val names = j.stageInfos.map(s => s"${s.name.takeWhile(_ != '$')}:${s.numTasks}")
      val desc = j.stageInfos.lastOption.map(_.name).getOrElse("?") +
        s"  [${names.mkString(" | ")}]"
      jobs.synchronized {
        jobs += ((j.jobId, desc, j.stageInfos.map(_.numTasks).sum))
        started(j.jobId) = j.time
      }
    }
    override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
      jobs.synchronized {
        started.get(j.jobId).foreach(t0 => wall(j.jobId) = (j.time - t0) / 1e3)
      }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files.createTempDirectory("fold_jobs").toString
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val cut = docs.agg(expr("percentile_approx(doc_id, 0.9)"))
      .collect()(0).getLong(0)
    docs.filter(col("doc_id") <= cut).write.parquet(s"$work/base/documents.parquet")
    docs.filter(col("doc_id") > cut).write.parquet(s"$work/batch/documents.parquet")
    graft.cli.Curate.run(spark, s"$work/base", s"$work/inc", 100L)

    val log = new JobLog
    spark.sparkContext.addSparkListener(log)
    graft.cli.Curate.runAdd(spark, s"$work/batch", s"$work/inc", 100L)
    org.apache.spark.graftbridge.SparkBridge.drainListenerBus(spark.sparkContext)
    spark.sparkContext.removeSparkListener(log)
    println(s"== ${log.jobs.length} jobs in the fold")
    log.jobs.foreach { case (id, desc, tasks) =>
      val w = log.wall.getOrElse(id, -1.0)
      println(f"job $id%3d tasks=$tasks%4d wall=$w%7.2fs  $desc")
    }
    println(f"== job wall sum ${log.wall.values.sum}%.2fs")
    spark.stop()
  }
}
