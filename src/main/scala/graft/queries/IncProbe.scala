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

      // mirrors IncrementalCuration.componentsFromPostings (postings
      // read, capped joins, fused census, stored-hs verification) with
      // a lap per sub-frame; falls back to the derive-from-state union
      // shape when the state has no postings store
      val postDir = s"$outDir/state/postings"
      val usePost = graft.layout.ZoneMap.exists(postDir)
      val batchRows = IncrementalCuration.postingsAll(prep.rows)
        .withColumn("__new", lit(true))
      val (simAll, mhAll) =
        if (usePost) {
          val touched = batchRows.select(col("bh")).distinct()
            .limit(IncrementalCuration.TouchedKeyLimit + 1)
            .collect().map(_.getLong(0)).toSeq
          lap(s"touched_keys (${touched.length})", touched.length)
          val scan = graft.layout.PrunedScan.read(spark, postDir,
            Seq(graft.layout.NumIn("bh", touched.map(_.toDouble))),
            schema = Some(IncrementalCuration.PostingsSchema))
          lap(s"postings_prune (${scan.filesKept}/${scan.filesTotal} files)", 0)
          val allRows = graft.runner.Materialize.trackLazy(
            scan.df.filter(col("bh").isInCollection(touched))
              .withColumn("__new", lit(false)).unionByName(batchRows))
          (allRows.filter(col("fam") === 0), allRows.filter(col("fam") === 1))
        } else {
          val allRows = graft.runner.Materialize.trackLazy(
            IncrementalCuration.postingsAll(state)
              .withColumn("__new", lit(false)).unionByName(batchRows))
          (allRows.filter(col("fam") === 0), allRows.filter(col("fam") === 1))
        }
      val c = DedupQueries.bandCensusRows(simAll, mhAll)
      lap(s"band_census (sim=${c.simMax} mh=${c.mhMax})", 0)
      val simEdges = DedupQueries.simhashPairsOfRows(simAll, Some("__new"),
          DedupQueries.SimhashBandCap, Some(c.simMax), c.simHot)
        .select(col("da"), col("db"))
      lap("sim_edges", simEdges.count())
      val cand = graft.runner.Materialize.track(
        DedupQueries.minhashCandidatesRows(mhAll, Some("__new"),
          DedupQueries.DegenerateBucketCap, Some(c.mhMax), c.mhHot))
      lap("minhash_candidates", cand.count())
      val candIds = cand.select(explode(array(col("da"), col("db"))).as("doc_id"))
        .distinct().limit(IncrementalCuration.CandIdLimit + 1).collect()
      lap(s"cand_ids (${candIds.length})", candIds.length)
      val sets0 = state.select(col("doc_id"), col("hs"))
        .unionByName(prep.rows.select(col("doc_id"), col("hs")))
      val sets = graft.runner.Materialize.trackLazy(
        if (candIds.length > IncrementalCuration.CandIdLimit) sets0
        else sets0.filter(col("doc_id")
          .isInCollection(candIds.map(_.getLong(0)).toSeq)))
      val mhEdges = DedupQueries.verifiedBySets(cand, sets)
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
