package graft.cli

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AnalyzeCliSuite extends SparkTestBase {

  test("Analyze writes every section and a summary consistent with the corpus") {
    val out = tmpDir("analyze_out")
    val json = Analyze.run(spark, "/root/testdata/sf0.001", out)

    Analyze.Sections.foreach { s =>
      assert(new java.io.File(s"$out/sections/$s").exists, s"missing section $s")
    }
    val nDocs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(json.contains(s""""n_docs":$nDocs"""), json)
    assert(json.contains("\"total_tokens\":"))

    // section internal consistency: the repetition gate never keeps more
    // docs than exist, and keyness emits exactly 5 terms per language
    val rep = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$out/sections/q75_repetition_filter")
    assert(rep.filter(col("n_kept") > col("n_docs")).count() == 0)
    val key = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$out/sections/q80_keyness_terms")
    assert(key.groupBy(col("lang")).count()
      .filter(col("count") =!= 5).count() == 0)
    // the summary file round-trips from disk
    val onDisk = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "summary.json")))
    assert(onDisk == json)
  }
}
