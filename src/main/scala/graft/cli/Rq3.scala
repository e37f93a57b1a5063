package graft.cli

import org.apache.spark.sql.SparkSession

/** RQ3 experiment main — the reference's scale sweep
  * (scripts/run_RQ_3_matrix.sh: one TPC-H scale per run, `scales="64"`):
  * does the layout benefit PERSIST as the same workload runs against
  * growing data? Here the driver's three testdata scales stand in
  * (sf0.001/0.01/0.1 — 6k/60k/600k lineitem rows); file count per
  * layout is held fixed so the only axis moving is data volume per
  * file, which is what a growing lakehouse partition looks like between
  * compactions.
  *
  * For each scale, the full Scenario matrix runs: profile → fill banded
  * 2-D range workloads → four layouts → pruned-scan every query.
  *
  * Outputs in outDir (default results/rq3):
  *   - rq3_geomean.csv: sf,band,layout,geomean_speedup,
  *     geomean_files_ratio,files_kept,files_total
  *   - rq3_queries.csv: per-cell rows with the sf column first
  *
  * Usage: runMain graft.cli.Rq3 [outDir] [nPerBand] [numFiles]
  */
object Rq3 {

  val Scales: Seq[(String, String)] = Seq(
    "0.001" -> "/root/testdata/sf0.001",
    "0.01" -> "/root/testdata/sf0.01",
    "0.1" -> "/root/testdata/sf0.1")

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("results/rq3")
    val nPerBand = args.lift(1).map(_.toInt).getOrElse(6)
    val numFiles = args.lift(2).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val perSf = Scales.map { case (sf, dir) =>
      val cells = Scenario.runMatrix(spark, dir,
        nPerBand = nPerBand, numFiles = numFiles)
      (sf, cells, Scenario.geomeans(cells))
    }

    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    def f3(v: Double): String =
      if (v.isNaN) "" else "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def w(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(dir.resolve(name),
        lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    w("rq3_geomean.csv",
      "sf,band,layout,geomean_speedup,geomean_files_ratio,files_kept,files_total" +:
        perSf.flatMap { case (sf, _, geo) =>
          geo.map(g => s"$sf,${g.band},${g.layout},${f3(g.gmWallSpeedup)}," +
            s"${f3(g.gmFilesRatio)},${g.filesKept},${g.filesTotal}")
        })
    w("rq3_queries.csv",
      "sf,band,query,layout,rows,wall_sec,files_kept,files_total,bytes_scanned" +:
        perSf.flatMap { case (sf, cells, _) =>
          cells.map(c => s"$sf,${c.band},${c.query},${c.layout},${c.rows}," +
            s"${f3(c.wallSec)},${c.filesKept},${c.filesTotal},${c.bytesScanned}")
        })

    println(f"${"sf"}%-6s ${"band"}%-5s ${"layout"}%-10s ${"gmFiles"}%8s ${"kept/total"}%12s")
    perSf.foreach { case (sf, _, geo) =>
      geo.foreach { g =>
        println(f"$sf%-6s ${g.band}%-5s ${g.layout}%-10s ${g.gmFilesRatio}%8.3f ${s"${g.filesKept}/${g.filesTotal}"}%12s")
      }
    }
    println(s"[rq3] matrix written to $outDir")
    spark.stop()
  }
}
