package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** RQ7-style decay curve for INCREMENTAL CURATION (the reference's RQ7
  * measures layout decay under update batches, scripts/
  * run_RQ_7_matrix.sh; this is the analog for the curation state): the
  * corpus is built from the first doc_id decile, then the remaining
  * nine deciles fold in one batch at a time. After each fold we record
  * corpus size, cluster count, retired representatives, and the add's
  * wall clock — the curve that shows whether add latency decays
  * (grows) with accumulated state or stays batch-bound. A final
  * from-scratch rebuild checks the folded corpus row-for-row.
  *
  * Usage: runMain graft.tools.IncDecay [sfDir] [workDir]
  * Writes workDir/decay.csv (copy to results/rq7_inc/).
  */
object IncDecay {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/graft_incdecay")
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

    val docs = graft.Tables.load(spark, sfDir, "documents")
    val cuts = docs.stat.approxQuantile(
      "doc_id", (1 until 10).map(_ / 10.0).toArray, 0.0).map(_.toLong)
    def sliceDir(i: Int): String = s"$work/b$i"
    val bounds = (Long.MinValue +: cuts) :+ Long.MaxValue
    for (i <- 0 until 10) {
      docs.filter(col("doc_id") > bounds(i) && col("doc_id") <= bounds(i + 1))
        .write.parquet(s"${sliceDir(i)}/documents.parquet")
    }

    val out = s"$work/inc"
    val rows = scala.collection.mutable.ArrayBuffer[String]()
    rows += "batch,n_state_docs,n_corpus,n_clusters,retired_reps,add_sec"
    def stateStats(): (Long, Long, Long) = {
      val n = spark.read.parquet(s"$out/state/docs").count()
      val comps = spark.read.parquet(s"$out/state/components")
      val reps = comps.filter(col("component") === col("doc_id")).count()
      (n, spark.read.parquet(s"$out/docs").count(), reps)
    }
    graft.cli.Curate.run(spark, sliceDir(0), out, 100L)
    val (n0, c0, k0) = stateStats()
    rows += s"0,$n0,$c0,$k0,0,"
    for (i <- 1 until 10) {
      val before = spark.read.parquet(s"$out/state/components")
        .filter(col("component") === col("doc_id")).count()
      System.gc()
      val t0 = System.nanoTime()
      graft.cli.Curate.runAdd(spark, sliceDir(i), out, 100L)
      val sec = (System.nanoTime() - t0) / 1e9
      val (n, c, k) = stateStats()
      // reps can only be lost among PRE-BATCH ids (merges); new clusters
      // add reps. retired = before + newClusters - after, where
      // newClusters = reps among this batch's ids
      val newReps = spark.read.parquet(s"$out/state/components")
        .filter(col("component") === col("doc_id") &&
          col("doc_id") > bounds(i))
        .count()
      val retired = before + newReps - k
      rows += f"$i,$n,$c,$k,$retired,$sec%.2f"
      println(rows.last)
    }
    // ground truth: one from-scratch rebuild over the full corpus
    graft.cli.Curate.run(spark, sfDir, s"$work/full", 100L)
    def key(dir: String) = spark.read.parquet(s"$dir/docs")
      .select("doc_id", "split").collect().map(_.toSeq)
      .sortBy(_.head.toString.toLong)
    val identical = key(out).sameElements(key(s"$work/full"))
    rows += s"# outputs_identical=$identical"
    java.nio.file.Files.write(java.nio.file.Paths.get(work, "decay.csv"),
      rows.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[incdecay] outputs_identical=$identical -> $work/decay.csv")
    spark.stop()
  }
}
