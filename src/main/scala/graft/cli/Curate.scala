package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus curation CLI — runs the q72 pipeline (quality gate → exact
  * dedup → near-dup cluster dedup → deterministic split) over a
  * documents table and writes the curated corpus split-partitioned,
  * plus a summary CSV and the dedup STATE that incremental runs build
  * on. The practical entry point for "give me a clean train/val/test
  * corpus from this dump", and for growing it batch by batch.
  *
  * Usage:
  *   runMain graft.cli.Curate <sfDir> <outDir> [minChars]       full build
  *   runMain graft.cli.Curate add <batchDir> <outDir> [minChars]
  *     fold <batchDir>'s documents into the corpus at <outDir> —
  *     signatures are read from the stored state, edges are computed
  *     batch x (batch ∪ state) only, output matches a from-scratch
  *     rebuild (IncrementalCurationSuite).
  *
  * Output layout:
  *   outDir/docs/split=train|val|test/  parquet files with (doc_id,
  *     text, lang, source, n_chars, n_tok)
  *   outDir/summary.csv  (split,lang,n_docs,total_tokens)
  *   outDir/state/  parquet: every exact-kept doc + signatures +
  *     component (see IncrementalCuration)
  */
object Curate {

  /** Full-build run; separated from main() so tests drive it with a
    * shared session.
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      minChars: Long): Seq[String] = {
    try {
      val docs = graft.Tables.parallelized(
        graft.Tables.load(spark, sfDir, "documents"))
      writeOut(spark, graft.queries.IncrementalCuration.initState(docs, minChars), outDir)
    } finally graft.runner.Materialize.releaseAll()
  }

  /** Incremental run: fold a new batch into an existing corpus dir. */
  def runAdd(spark: SparkSession, batchDir: String, outDir: String,
      minChars: Long): Seq[String] = {
    try {
      require(java.nio.file.Files.exists(java.nio.file.Paths.get(outDir, "state")),
        s"$outDir/state not found — run the full build first")
      val state = spark.read.parquet(s"$outDir/state")
      val batch = graft.Tables.parallelized(
        graft.Tables.load(spark, batchDir, "documents"))
      writeOut(spark,
        graft.queries.IncrementalCuration.addBatch(state, batch, minChars), outDir)
    } finally graft.runner.Materialize.releaseAll()
  }

  private def writeOut(spark: SparkSession, state: org.apache.spark.sql.DataFrame,
      outDir: String): Seq[String] = {
    val curated = graft.queries.IncrementalCuration.corpus(state)
    curated.write.mode("overwrite").partitionBy("split")
      .parquet(s"$outDir/docs")
    // the state plan may READ outDir/state (add mode) — write to a
    // sibling dir and swap, never overwrite a path mid-read. (On a real
    // lakehouse this would be a manifest version bump.)
    val statePath = java.nio.file.Paths.get(outDir, "state")
    val newPath = java.nio.file.Paths.get(outDir, "state.new")
    state.write.mode("overwrite").parquet(newPath.toString)
    deleteRec(statePath.toFile)
    java.nio.file.Files.move(newPath, statePath)

    val summary = spark.read.parquet(s"$outDir/docs")
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"))
      .orderBy(col("split"), col("lang"))
      .collect()
    val lines = "split,lang,n_docs,total_tokens" +:
      summary.map(r => s"${r.get(0)},${r.get(1)},${r.get(2)},${r.get(3)}").toSeq
    java.nio.file.Files.write(java.nio.file.Paths.get(outDir, "summary.csv"),
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    lines
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRec))
    f.delete()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lines = args.headOption match {
      case Some("add") =>
        val batchDir = args.lift(1).getOrElse(
          sys.error("usage: Curate add <batchDir> <outDir> [minChars]"))
        val outDir = args.lift(2).getOrElse("/tmp/graft_curated")
        runAdd(spark, batchDir, outDir, args.lift(3).map(_.toLong).getOrElse(100L))
      case _ =>
        val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
        val outDir = args.lift(1).getOrElse("/tmp/graft_curated")
        run(spark, sfDir, outDir, args.lift(2).map(_.toLong).getOrElse(100L))
    }
    lines.foreach(println)
    println("[curate] corpus written")
    spark.stop()
  }
}
