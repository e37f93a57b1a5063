package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev benchmark: incremental curation vs full rebuild. Splits the
  * corpus at the 90th doc_id percentile, builds the base corpus once,
  * then times (a) folding the last-10% batch in via the stored state
  * and (b) rebuilding everything from scratch. Prints one JSON line.
  *
  * Usage: runMain graft.tools.IncBench [sfDir] [workDir] [basePercentile]
  */
object IncBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/graft_incbench")
    val pct = args.lift(2).map(_.toDouble).getOrElse(0.9)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rmrf(p: String): Unit = {
      def rec(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rec)); f.delete()
      }
      rec(new java.io.File(p))
    }
    rmrf(work)

    // drift context IN the artifact (r16 stretch #8)
    val calFirst = graft.runner.Calibration.measure(spark, sfDir)

    val docs = graft.Tables.load(spark, sfDir, "documents")
    val cut = docs.agg(expr(s"percentile_approx(doc_id, $pct)"))
      .collect()(0).getLong(0)
    docs.filter(col("doc_id") <= cut).write.parquet(s"$work/base/documents.parquet")
    docs.filter(col("doc_id") > cut).write.parquet(s"$work/batch/documents.parquet")
    val nBase = spark.read.parquet(s"$work/base/documents.parquet").count()
    val nBatch = spark.read.parquet(s"$work/batch/documents.parquet").count()

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // build the base state (not part of either measurement)
    graft.cli.Curate.run(spark, s"$work/base", s"$work/inc", 100L)
    System.gc()
    val addSec = timed {
      graft.cli.Curate.runAdd(spark, s"$work/batch", s"$work/inc", 100L)
    }
    System.gc()
    val fullSec = timed {
      graft.cli.Curate.run(spark, sfDir, s"$work/full", 100L)
    }
    // sanity: identical corpora
    def key(dir: String) = spark.read.parquet(s"$dir/docs")
      .select("doc_id", "split").collect().map(_.toSeq).sortBy(_.head.toString.toLong)
    val same = key(s"$work/inc").sameElements(key(s"$work/full"))
    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val calLast = graft.runner.Calibration.measure(spark, sfDir)
    val cal = graft.runner.Calibration.inRunJson(calFirst, calLast)
    println(s"""{"sf":"$sfDir","n_base":$nBase,"n_batch":$nBatch,""" +
      s""""incremental_add_sec":${f3(addSec)},"full_rebuild_sec":${f3(fullSec)},""" +
      s""""speedup":${f3(fullSec / addSec)},"outputs_identical":$same,""" +
      s""""calibration":$cal}""")
    spark.stop()
  }
}
