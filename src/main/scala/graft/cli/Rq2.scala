package graft.cli

import org.apache.spark.sql.SparkSession

/** RQ2 experiment main — the reference's N-dimensional layout matrix
  * (workload_spec/generate_tpch_rq2_specs.py:44-59, driven by
  * scripts/run_RQ_2_matrix.sh): does the curve choice separate as the
  * number of layout dimensions grows? The reference's N=3/4/5 column
  * configs use l_receiptdate/l_commitdate, which the driver testdata
  * does not carry — high-cardinality numeric columns stand in
  * (l_suppkey/l_partkey/l_orderkey), which preserves the question being
  * asked (curve quality over N dimensions), not the specific columns.
  *
  * For each N, the full Scenario machinery runs: profile → fill banded
  * N-D range workload (per-dimension selectivity = Nth root of the band
  * target) → write all four layouts over the N columns → pruned-scan
  * every query against every layout.
  *
  * Outputs in outDir (default results/rq2):
  *   - rq2_geomean.csv: n,band,layout,geomean_speedup,
  *     geomean_files_ratio,files_kept,files_total
  *   - rq2_queries.csv: per-cell heatmap rows with the n column first
  *
  * Usage: runMain graft.cli.Rq2 [sfDir] [outDir] [nPerBand] [numFiles]
  */
object Rq2 {

  val ColSets: Seq[(Int, Seq[String])] = Seq(
    3 -> Seq("l_quantity", "l_extendedprice", "l_suppkey"),
    4 -> Seq("l_quantity", "l_extendedprice", "l_suppkey", "l_partkey"),
    5 -> Seq("l_quantity", "l_extendedprice", "l_suppkey", "l_partkey", "l_orderkey"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("results/rq2")
    val nPerBand = args.lift(2).map(_.toInt).getOrElse(6)
    val numFiles = args.lift(3).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val perN = ColSets.map { case (n, cols) =>
      val cells = Scenario.runMatrix(spark, sfDir,
        nPerBand = nPerBand, numFiles = numFiles, cols = cols)
      (n, cells, Scenario.geomeans(cells))
    }

    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    def f3(v: Double): String =
      if (v.isNaN) "" else "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def w(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(dir.resolve(name),
        lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    w("rq2_geomean.csv",
      "n,band,layout,geomean_speedup,geomean_files_ratio,files_kept,files_total" +:
        perN.flatMap { case (n, _, geo) =>
          geo.map(g => s"$n,${g.band},${g.layout},${f3(g.gmWallSpeedup)}," +
            s"${f3(g.gmFilesRatio)},${g.filesKept},${g.filesTotal}")
        })
    w("rq2_queries.csv",
      "n,band,query,layout,rows,wall_sec,files_kept,files_total,bytes_scanned" +:
        perN.flatMap { case (n, cells, _) =>
          cells.map(c => s"$n,${c.band},${c.query},${c.layout},${c.rows}," +
            s"${f3(c.wallSec)},${c.filesKept},${c.filesTotal},${c.bytesScanned}")
        })

    println(f"${"n"}%-3s ${"band"}%-5s ${"layout"}%-10s ${"gmFiles"}%8s ${"kept/total"}%12s")
    perN.foreach { case (n, _, geo) =>
      geo.foreach { g =>
        println(f"$n%-3d ${g.band}%-5s ${g.layout}%-10s ${g.gmFilesRatio}%8.3f ${s"${g.filesKept}/${g.filesTotal}"}%12s")
      }
    }
    println(s"[rq2] matrix written to $outDir")
    spark.stop()
  }
}
