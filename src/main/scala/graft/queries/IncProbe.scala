package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase decomposition of one incremental add's `components`
  * step over a prepared corpus dir (as left by IncBench) — times each
  * sub-frame of the edge pipeline and the CC fold separately so the
  * dominant cost has a name before any optimization is attempted.
  *
  * Usage: runMain graft.queries.IncProbe <corpusDir> <batchDir>
  */
object IncProbe {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_incbench1/inc_probe")
    val batchDir = args.lift(1).getOrElse("/tmp/graft_incbench1/batch")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var t0 = System.nanoTime()
    def lap(phase: String, n: Long): Unit = {
      val t = System.nanoTime()
      println(f"[probe] $phase%-28s ${(t - t0) / 1e9}%6.2fs  rows=$n")
      t0 = t
    }
    try {
      val state = spark.read.parquet(s"$outDir/state/docs")
      val comps = spark.read.parquet(s"$outDir/state/components")
      val batch = graft.Tables.parallelized(
        graft.Tables.load(spark, batchDir, "documents"))
      val prep = IncrementalCuration.prepareBatch(state, batch, 100L)
      lap("prepare_batch", prep.rows.count())
      lap("prep_count_action", 0)

      // mirrors IncrementalCuration.components (capped joins, fused
      // census, stored-hs verification) with a lap per sub-frame
      val shAll = graft.runner.Materialize.trackLazy(
        state.select(col("doc_id"), col("sh"))
          .withColumn("__new", lit(false))
          .unionByName(prep.rows.select(col("doc_id"), col("sh"))
            .withColumn("__new", lit(true))))
      val sigAll = graft.runner.Materialize.trackLazy(
        state.select((col("doc_id") +: DedupQueries.SigCols.map(col)): _*)
          .withColumn("__new", lit(false))
          .unionByName(prep.rows.select((col("doc_id") +: DedupQueries.SigCols.map(col)): _*)
            .withColumn("__new", lit(true))))
      val c = DedupQueries.bandCensus(shAll, sigAll)
      lap(s"band_census (sim=${c.simMax} mh=${c.mhMax})", 0)
      val simEdges = DedupQueries.simhashPairsOf(shAll, Some("__new"),
          DedupQueries.SimhashBandCap, Some(c.simMax), c.simHot)
        .select(col("da"), col("db"))
      lap("sim_edges", simEdges.count())
      val cand = graft.runner.Materialize.track(
        DedupQueries.minhashCandidates(sigAll, Some("__new"),
          DedupQueries.DegenerateBucketCap, Some(c.mhMax), c.mhHot))
      lap("minhash_candidates", cand.count())
      val mhEdges = DedupQueries.verifiedBySets(
        cand, state.select(col("doc_id"), col("hs"))
          .unionByName(prep.rows.select(col("doc_id"), col("hs"))))
      lap("mh_edges_verified", mhEdges.count())
      val oldStars = comps.filter(col("component") =!= col("doc_id"))
        .select(col("doc_id").as("da"), col("component").as("db"))
      val labels = graft.operators.ConnectedComponents
        .run(simEdges.unionAll(mhEdges).unionAll(oldStars))
        .withColumnRenamed("id", "doc_id")
      lap("cc", labels.count())
      val out = state.select(col("doc_id")).unionAll(prep.rows.select(col("doc_id")))
        .join(labels, Seq("doc_id"), "left")
        .withColumn("component", coalesce(col("component"), col("doc_id")))
      out.write.mode("overwrite").parquet(s"$outDir/state/components.probe")
      lap("label_join_write", 0)
    } finally graft.runner.Materialize.releaseAll()
    spark.stop()
  }
}
