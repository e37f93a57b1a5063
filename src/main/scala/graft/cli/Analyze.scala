package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus analysis report CLI — the "know your data before you train on
  * it" readout. Runs the oracle-gated text/quality/dedup analysis
  * family over a documents table and writes one CSV per section plus a
  * headline summary.json: corpus size and token totals, language mix,
  * quality ratios, repetition-gate and surprisal-flag counts, exact-dup
  * and duplicated-span signals, and the distinctive terms per language.
  * Every section IS a gate query (same code path the DuckDB oracle
  * checks), so the report's numbers carry the correctness gate with
  * them.
  *
  * Usage: runMain graft.cli.Analyze <sfDir> <outDir>
  *
  * Output layout:
  *   outDir/sections/<query>/  one CSV dir per section
  *   outDir/summary.json       headline corpus numbers
  */
object Analyze {

  /** The analysis sections, in report order. */
  val Sections: Seq[String] = Seq(
    "q24_token_count", "q25_text_quality", "q26_lang_id",
    "q27_fingerprint", "q28_dedup_exact", "q75_repetition_filter",
    "q76_span_dedup", "q79_unigram_surprisal", "q80_keyness_terms",
    "q91_collocations", "q92_bpe_tokens")

  def run(spark: SparkSession, sfDir: String, outDir: String): String = {
    try {
      Sections.foreach { name =>
        graft.SparkEntry.queries(name)(spark, sfDir)
          .coalesce(1).write.mode("overwrite")
          .option("header", "true").csv(s"$outDir/sections/$name")
        graft.runner.Materialize.releaseAll()
      }
      // headline numbers from the written sections (each is a tiny
      // per-lang/source rollup — driver-side reads are bounded by the
      // group counts, never corpus-sized). Columns are cast explicitly:
      // inferSchema on a header-only (empty-corpus) CSV types every
      // column string, and implicit string arithmetic is fragile if a
      // section ever gains a same-named non-numeric column.
      def section(name: String) =
        spark.read.option("header", "true").csv(s"$outDir/sections/$name")
      def asL(name: String) = col(name).cast("long")
      // coalesce(0): an empty corpus leaves header-only section CSVs
      // whose sums are null — the summary must still be written
      def sumOf(name: String, expr: org.apache.spark.sql.Column): Long =
        section(name).agg(coalesce(sum(expr), lit(0L)).cast("long"))
          .collect()(0).getLong(0)
      val tok = section("q24_token_count")
        .agg(coalesce(sum(asL("n_docs")), lit(0L)).cast("long").as("docs"),
          coalesce(sum(asL("total_tokens")), lit(0L)).cast("long").as("toks"),
          count(lit(1)).as("langs")).collect()(0)
      val rep = sumOf("q75_repetition_filter", asL("n_docs") - asL("n_kept"))
      val spn = sumOf("q76_span_dedup", asL("n_dropped"))
      val sur = sumOf("q79_unigram_surprisal", asL("n_flagged"))
      val dup = sumOf("q28_dedup_exact", asL("n_docs") - asL("n_unique"))
      val summary =
        s"""{"sf_dir":"$sfDir","n_docs":${tok.getLong(0)},"total_tokens":${tok.getLong(1)},
           |"n_langs":${tok.getLong(2)},"exact_dup_docs":$dup,
           |"repetition_dropped":$rep,"span_dup_dropped":$spn,
           |"surprisal_flagged":$sur,
           |"sections":[${Sections.map("\"" + _ + "\"").mkString(",")}]}
           |""".stripMargin.replace("\n", "").concat("\n")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, "summary.json"), summary)
      summary
    } finally graft.runner.Materialize.releaseAll()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/tmp/graft_report")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    print(run(spark, sfDir, outDir))
    println(s"[analyze] report written to $outDir")
    spark.stop()
  }
}
