package graft.cli

import org.apache.spark.sql.SparkSession
import graft.profile.{Profiler, StatsIO}
import graft.wlg.{WorkloadGen, YamlSpec}

/** Workload-generator CLI — the reference's `wlg.cli fill` pipeline end
  * to end (wlg/cli/main.py:75-561): YAML spec in → column stats
  * (profiled, or loaded from a stats.yaml) → selectivity-controlled
  * query instances → numbered `.sql` files + workload document out.
  *
  * Usage: runMain graft.cli.Wlg
  *   --spec <spec.yaml> --table <parquet path> --out <dir>
  *   [--stats <stats.yaml>]   # reuse a profiled stats doc
  *   [--view <name>]          # table name substituted for {{tbl}} (default: tbl)
  *
  * Emits into --out: `stats.yaml` (when profiled here), per-template
  * `query_NNNN.sql` files, `workload.json`, and `workload.yaml` (the
  * reference's yaml_emit shape).
  */
object Wlg {

  def main(args: Array[String]): Unit = {
    var spec = ""; var table = ""; var out = ""; var statsPath = ""; var view = "tbl"
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--spec" => spec = args(i + 1); i += 2
        case "--table" => table = args(i + 1); i += 2
        case "--out" => out = args(i + 1); i += 2
        case "--stats" => statsPath = args(i + 1); i += 2
        case "--view" => view = args(i + 1); i += 2
        case other => throw new IllegalArgumentException(s"unknown flag $other")
      }
    }
    require(spec.nonEmpty && table.nonEmpty && out.nonEmpty,
      "usage: Wlg --spec <spec.yaml> --table <parquet> --out <dir> [--stats <stats.yaml>] [--view tbl]")

    val specs = YamlSpec.parseSpec(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(spec)), "UTF-8"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))

    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", "local[8]")), "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val stats =
        if (statsPath.nonEmpty) StatsIO.readYaml(statsPath)
        else {
          val s = Profiler.profile(spark.read.parquet(table))
          StatsIO.writeYaml(s"$out/stats.yaml", s)
          s
        }
      val instances = specs.flatMap(t => WorkloadGen.fill(t, stats, view))
      WorkloadGen.emit(out, instances)
      YamlSpec.writeWorkloadYaml(s"$out/workload.yaml", instances)
      println(s"[wlg] ${instances.length} instances from ${specs.length} template(s) -> $out")
    } finally spark.stop()
  }
}
