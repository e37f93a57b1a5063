package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.layout._
import graft.layout.LayoutWriter.LayoutSpec
import graft.runner.{MetricsListener, QueryRunner}
import graft.table.{BatchBuilder, Upserter}

/** RQ7-style incremental-maintenance scenario (reference:
  * scripts/run_RQ_7_matrix.sh + build_tpch_update_batches.py +
  * hudi_upsert.py): materialize a layout table, split an update set into
  * B batches, then upsert batch-by-batch re-running the probe query
  * after each to track layout decay (files/bytes scanned growing as
  * unclustered data accumulates), with an optional re-cluster at the end
  * showing recovery.
  *
  * Usage: runMain graft.cli.Incremental [sfDir] [batches] [outCsv]
  */
object Incremental {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val batches = args.lift(1).map(_.toInt).getOrElse(4)
    val outCsv = args.lift(2).getOrElse("/tmp/graft_incremental.csv")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master("local[8]"), "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)

    // Base table: first 70% of orders, linear-clustered on o_orderdate.
    val orders = Tables.load(spark, sfDir, "orders")
    val maxKey = orders.agg(max("o_orderkey")).collect()(0).getLong(0)
    val cut = (maxKey * 0.7).toLong
    val dir = java.nio.file.Files.createTempDirectory("graft_rq7_").toString
    LayoutWriter.write(
      orders.filter(col("o_orderkey") <= cut), dir,
      LayoutSpec("linear", Seq("o_orderdate"), numFiles = Some(8),
        recordKey = Some("o_orderkey")))

    // Update set: remaining 30%, split into deterministic hash batches.
    val updates = BatchBuilder.splitHash(
      orders.filter(col("o_orderkey") > cut), batches, seed = 42, keyCol = "o_orderkey")

    def probe(tag: String): QueryRunner.QueryMetrics = {
      val scan = PrunedScan.read(spark, dir, Seq(
        NumBetween("o_orderdate",
          daysSinceEpoch("1996-01-01"), daysSinceEpoch("1996-12-31"))))
      val m = QueryRunner.run(spark,
        scan.df.filter(col("o_orderdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
          .agg(count(lit(1)), sum("o_totalprice")),
        tag, Some(listener), warmup = true)
      m.copy(name = s"$tag;kept=${scan.filesKept}/${scan.filesTotal}")
    }

    val results = scala.collection.mutable.ArrayBuffer(probe("batch00"))
    for (b <- 0 until batches) {
      Upserter.upsert(spark, dir, updates.filter(col("batch_id") === b).drop("batch_id"))
      results += probe(f"batch${b + 1}%02d")
    }
    // Re-cluster (compaction preserves the declared layout) and re-probe:
    // target 1/8 of the table per file so pruning granularity is restored
    // (at production scale this is the 128 MB default).
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val total = fs.getContentSummary(new org.apache.hadoop.fs.Path(dir)).getLength
    Compactor.compact(spark, dir, targetFileBytes = math.max(1L, total / 8))
    results += probe("reclustered")

    QueryRunner.writeCsv(outCsv, results.toSeq)
    println(f"${"step"}%-24s ${"files"}%6s ${"bytesKB"}%9s ${"rows"}%7s")
    results.foreach { m =>
      println(f"${m.name}%-24s ${m.filesScanned}%6d ${m.bytesScanned / 1024}%9d ${m.recordsRead}%7d")
    }
    println(s"[incremental] results written to $outCsv")
    spark.stop()
  }

  private def daysSinceEpoch(d: String): Double =
    java.time.LocalDate.parse(d).toEpochDay.toDouble * 86400.0
}
