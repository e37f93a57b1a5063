package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus curation CLI — runs the q72 pipeline (quality gate → exact
  * dedup → near-dup cluster dedup → deterministic split) over a
  * documents table and writes the curated corpus split-partitioned,
  * plus a summary CSV. The practical entry point for "give me a clean
  * train/val/test corpus from this dump".
  *
  * Usage: runMain graft.cli.Curate <sfDir> <outDir> [minChars]
  *
  * Output layout:
  *   outDir/docs/split=train|val|test/  parquet files with (doc_id,
  *     text, lang, source, n_chars, n_tok)
  *   outDir/summary.csv  (split,lang,n_docs,total_tokens)
  */
object Curate {

  /** The curation run; separated from main() so tests drive it with a
    * shared session.
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      minChars: Long): Seq[String] = {
    try {
      val docs = graft.Tables.parallelized(
        graft.Tables.load(spark, sfDir, "documents"))
      val curated = graft.queries.CurationQueries.curate(docs, minChars)

      curated.write.mode("overwrite").partitionBy("split")
        .parquet(s"$outDir/docs")

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
    } finally graft.runner.Materialize.releaseAll()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/tmp/graft_curated")
    val minChars = args.lift(2).map(_.toLong).getOrElse(100L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, outDir, minChars).foreach(println)
    println(s"[curate] corpus written to $outDir")
    spark.stop()
  }
}
