package graft.cli

import org.apache.spark.sql.SparkSession

/** RQ4 experiment main — the reference's grouped/ordered/limited layout
  * matrix (workload_spec/generate_tpch_rq4_specs.py, driven by
  * scripts/run_RQ_4_matrix.sh): the RQ1 selectivity-banded predicates
  * with GROUP BY / ORDER BY cnt DESC / LIMIT 1000 variants appended.
  * Pruning is identical across shapes by construction (same WHERE);
  * the question is whether the layout SPEEDUP survives when the query
  * does real post-scan work (partial+final hash aggregation, a
  * TakeOrderedAndProject) instead of a bare count — i.e., how much of
  * the wall-time win at each selectivity band is scan-bound.
  *
  * Outputs in outDir (default results/rq4):
  *   - rq4_geomean.csv: shape,band,layout,geomean_speedup,
  *     geomean_files_ratio,files_kept,files_total
  *   - rq4_queries.csv: per-cell rows with the shape column first
  *
  * Usage: runMain graft.cli.Rq4 [sfDir] [outDir] [nPerBand] [numFiles]
  */
object Rq4 {

  val Shapes = Seq("plain", "group", "group_order_limit")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("results/rq4")
    val nPerBand = args.lift(2).map(_.toInt).getOrElse(6)
    val numFiles = args.lift(3).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus, sfDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val perShape = Shapes.map { shape =>
      val cells = Scenario.runMatrix(spark, sfDir,
        nPerBand = nPerBand, numFiles = numFiles, shape = shape)
      (shape, cells, Scenario.geomeans(cells))
    }

    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    def f3(v: Double): String =
      if (v.isNaN) "" else "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def w(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(dir.resolve(name),
        lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    w("rq4_geomean.csv",
      "shape,band,layout,geomean_speedup,geomean_files_ratio,files_kept,files_total" +:
        perShape.flatMap { case (shape, _, geo) =>
          geo.map(g => s"$shape,${g.band},${g.layout},${f3(g.gmWallSpeedup)}," +
            s"${f3(g.gmFilesRatio)},${g.filesKept},${g.filesTotal}")
        })
    w("rq4_queries.csv",
      "shape,band,query,layout,rows,wall_sec,files_kept,files_total,bytes_scanned" +:
        perShape.flatMap { case (shape, cells, _) =>
          cells.map(c => s"$shape,${c.band},${c.query},${c.layout},${c.rows}," +
            s"${f3(c.wallSec)},${c.filesKept},${c.filesTotal},${c.bytesScanned}")
        })
    perShape.foreach { case (shape, _, geo) =>
      geo.filter(_.band == "S1").foreach(g =>
        println(f"$shape%-18s S1 ${g.layout}%-9s spd=${g.gmWallSpeedup}%7.3f " +
          f"files=${g.gmFilesRatio}%7.3f"))
    }
    println(s"[rq4] matrix written to $outDir")
    spark.stop()
  }
}
