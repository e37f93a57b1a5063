package graft.runner

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ByteProbesSuite extends SparkTestBase {

  private def partBytes(dir: String): (Long, Long) = {
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    (parts.length.toLong, parts.map(_.length).sum)
  }

  test("M2/M3 agree with on-disk part files for a full scan") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmpDir("byteprobes_full")
    (1 to 20000).map(i => (i.toLong, i % 97)).toDF("id", "k")
      .repartition(6).write.mode("overwrite").parquet(dir)
    val (nParts, diskBytes) = partBytes(dir)

    val df = spark.read.parquet(dir)
    assert(ByteProbes.inputFileBytes(df) == diskBytes)

    df.createOrReplaceTempView("bp_full")
    val (n3, b3) = ByteProbes.enumerateScannedFiles(spark, "SELECT * FROM bp_full")
    assert(n3 == nParts, s"M3 enumerated $n3 of $nParts files")
    assert(b3 == diskBytes)
    assert(ByteProbes.enumerateScannedFiles(df) == ((n3, b3)))
  }

  test("M3 sees partition pruning; M2 is the relation-listing upper bound") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmpDir("byteprobes_parts")
    (1 to 9000).map(i => (i.toLong, i % 3)).toDF("id", "p")
      .write.mode("overwrite").partitionBy("p").parquet(dir)

    val full = spark.read.parquet(dir)
    val pruned = full.filter($"p" === 1)
    // inputFiles lists the RELATION's files — a filter above it does not
    // shrink the listing (PySpark behaves identically for the
    // reference's bytes_sum_input_files): M2 is an upper bound
    val m2Full = ByteProbes.inputFileBytes(full)
    assert(ByteProbes.inputFileBytes(pruned) == m2Full)

    // M3 enumerates what actually produced rows: the pruned partition
    val (nFull, bFull) = ByteProbes.enumerateScannedFiles(full)
    val (nPruned, bPruned) = ByteProbes.enumerateScannedFiles(pruned)
    assert(nPruned > 0 && nPruned < nFull)
    assert(bPruned > 0 && bPruned < m2Full,
      s"M3 must shrink below the M2 bound: $bPruned vs $m2Full")
    assert(bFull == m2Full)
  }

  test("M3 returns (0,0) past an aggregation; M2 returns 0 for non-file sources") {
    val dir = tmpDir("byteprobes_agg")
    spark.range(1000).withColumn("k", col("id") % 10)
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("bp_agg")
    // rows out of an aggregate carry no file provenance (documented
    // reference caveat, run_queries.py:233-236)
    assert(ByteProbes.enumerateScannedFiles(spark,
      "SELECT k, count(*) FROM bp_agg GROUP BY k") == ((0L, 0L)))
    // in-memory range exposes no input files
    assert(ByteProbes.inputFileBytes(spark.range(10).toDF()) == 0L)
    // malformed SQL → reference's except-branch (0,0), no throw
    assert(ByteProbes.enumerateScannedFiles(spark, "SELECT FROM nope") == ((0L, 0L)))
  }

  test("QueryRunner falls back to the M2 upper bound when plan metrics carry no size") {
    val dir = tmpDir("byteprobes_runner")
    spark.range(5000).withColumn("v", rand(7))
      .write.mode("overwrite").parquet(dir)
    val (_, diskBytes) = partBytes(dir)
    // a DSv2 BatchScan node reports neither numFiles nor filesSize
    // (probed: metrics = numOutputRows only) and no listener is
    // attached, so the chain must land on M2's inputFiles bound
    // instead of 0 — exactly the reference's fallback role for this
    // probe (run_queries.py:650-700)
    val v1List = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try {
      val m = QueryRunner.run(spark,
        spark.read.parquet(dir).filter(col("v") >= 0), "bp_v2scan")
      assert(m.rows == 5000L)
      assert(m.bytesScanned == diskBytes,
        s"expected M2 fallback $diskBytes, got ${m.bytesScanned}")
    } finally spark.conf.set("spark.sql.sources.useV1SourceList", v1List)
  }
}
