package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.runner.{MetricsListener, QueryRunner, SqlScript}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Queries-directory runner — the reference's main entry point
  * (lakehouse_op/run_queries.py:708-771): loop sorted `*.sql` files,
  * substitute `{{tbl}}` with a registered table view, optional warmup,
  * measure each query, write one results CSV with the reference's 14
  * columns.
  *
  * Usage: runMain graft.cli.RunQueries --table <dir> --queries-dir <dir>
  *   [--output-csv results.csv] [--warmup] [--cache none|catalog|df]
  *   [--action count|collect|show] [--broadcast-hint] [--engine name]
  *   [--results-dir dir]
  *
  * With `--results-dir`, the CSV lands at dir/engine/<timestamp>.csv and
  * dir/engine/latest.csv is re-pointed at it (the reference's per-engine
  * results tree + `latest` symlink, scripts/run_query.sh:276-289);
  * `--output-csv` is ignored in that mode.
  *
  * Differences from the reference, by design:
  *  - a `.sql` file may hold multiple `;`-separated statements (TPC-H
  *    Q15); [[SqlScript]] runs setup/teardown DDL unmeasured and times
  *    the last SELECT — the tpch_all runner's protocol, folded in;
  *  - the table opens through [[graft.table.SfcTable]] when a layout
  *    manifest is present, so zone-map file skipping shows up in the
  *    files/bytes-scanned columns exactly like the lakehouse engines'
  *    stats-based skipping does in the reference's CSVs;
  *  - the REST-vs-eventlog column pairs collapse to one in-process
  *    source (plan metrics + task-metrics listener) — same TaskEnd
  *    numbers, no HTTP polling and no eventlog re-parse — with the
  *    `_ev` columns kept so downstream CSV tooling is unchanged.
  */
object RunQueries {

  case class Config(
      table: String = "",
      queriesDir: String = "",
      outputCsv: String = "results.csv",
      warmup: Boolean = false,
      cache: String = "none",
      action: String = "collect",
      broadcastHint: Boolean = false,
      engine: String = "graft",
      resultsDir: String = "")

  def parse(args: Array[String]): Config = {
    var c = Config()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--table" => c = c.copy(table = args(i + 1)); i += 2
        case "--queries-dir" => c = c.copy(queriesDir = args(i + 1)); i += 2
        case "--output-csv" => c = c.copy(outputCsv = args(i + 1)); i += 2
        case "--warmup" => c = c.copy(warmup = true); i += 1
        case "--cache" => c = c.copy(cache = args(i + 1)); i += 2
        case "--action" => c = c.copy(action = args(i + 1)); i += 2
        case "--broadcast-hint" => c = c.copy(broadcastHint = true); i += 1
        case "--engine" => c = c.copy(engine = args(i + 1)); i += 2
        case "--results-dir" => c = c.copy(resultsDir = args(i + 1)); i += 2
        case other => throw new IllegalArgumentException(s"unknown flag $other")
      }
    }
    require(c.table.nonEmpty && c.queriesDir.nonEmpty,
      "usage: RunQueries --table <dir> --queries-dir <dir> [--output-csv f]" +
        " [--warmup] [--cache none|catalog|df] [--action count|collect|show]" +
        " [--broadcast-hint]")
    require(Set("none", "catalog", "df")(c.cache), s"bad cache mode ${c.cache}")
    c
  }

  /** Open the table (zone-map FileIndex when a manifest exists, plain
    * parquet otherwise) and register it as the `{{tbl}}` view.
    */
  def registerTable(spark: SparkSession, dir: String, view: String = "tbl"): String = {
    val df =
      try graft.table.SfcTable.open(spark, dir)
      catch { case scala.util.control.NonFatal(_) => spark.read.parquet(dir) }
    df.createOrReplaceTempView(view)
    view
  }

  case class FileResult(
      query: String,
      metrics: QueryRunner.QueryMetrics,
      inputFileBytes: Long)

  /** The measured loop over sorted `*.sql` files; separated from main()
    * so tests drive it with a shared session.
    */
  def runDir(spark: SparkSession, cfg: Config, view: String): Seq[FileResult] = {
    val dir = Paths.get(cfg.queriesDir)
    val files = Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".sql")).toSeq.sortBy(_.getFileName.toString)
    require(files.nonEmpty, s"no .sql files found in ${cfg.queriesDir}")

    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)
    try {
      files.map { f =>
        val raw = new String(Files.readAllBytes(f), java.nio.charset.StandardCharsets.UTF_8)
        val text = raw.replace("{{tbl}}", view)
        val name = f.getFileName.toString
        def frame: DataFrame = SqlScript.run(spark, text)
        val m = QueryRunner.run(spark, frame, name, Some(listener),
          action = cfg.action, warmup = cfg.warmup)
        val inputBytes = frame.inputFiles.map { p =>
          try Files.size(Paths.get(new java.net.URI(p).getPath))
          catch { case scala.util.control.NonFatal(_) => 0L }
        }.sum
        FileResult(name, m, inputBytes)
      }
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** The reference CSV header, verbatim (run_queries.py:739-744). */
  val CsvHeader: String =
    "engine,query,bytesRead,elapsedTime_s,executorRunTime_s,executorCpuTime_s," +
      "bytes_input_files,files_scanned,bytes_scanned," +
      "bytesRead_ev,files_scanned_ev,bytes_scanned_ev,executorRunTime_s_ev,executorCpuTime_s_ev"

  def writeCsv(path: String, engine: String, rows: Seq[FileResult]): Unit = {
    def mb(b: Long): String = f"${b / (1024 * 1024.0)}%.3f"
    val body = rows.map { r =>
      val m = r.metrics
      val runS = f"${m.executorRunTimeMs / 1e3}%.3f"
      val cpuS = f"${m.executorCpuTimeNs / 1e9}%.3f"
      Seq(engine, r.query,
        m.bytesScanned.toString, f"${m.wallSec}%.3f", runS, cpuS,
        mb(r.inputFileBytes), m.filesScanned.toString, mb(m.bytesScanned),
        m.bytesScanned.toString, m.filesScanned.toString, mb(m.bytesScanned),
        runS, cpuS).mkString(",")
    }
    Files.write(Paths.get(path),
      (CsvHeader +: body).mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** dir/engine/<timestamp>.csv under `--results-dir`, else the plain
    * `--output-csv` path.
    */
  def resolveOutput(cfg: Config): String =
    if (cfg.resultsDir.isEmpty) cfg.outputCsv
    else {
      val ts = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")
        .format(java.time.LocalDateTime.now())
      val dir = Paths.get(cfg.resultsDir, cfg.engine)
      Files.createDirectories(dir)
      dir.resolve(s"$ts.csv").toString
    }

  /** Re-point <dir>/latest.csv at the just-written CSV (symlink; falls
    * back to a copy on filesystems without symlink support).
    */
  def updateLatest(csvPath: String): Unit = {
    val p = Paths.get(csvPath)
    val link = p.getParent.resolve("latest.csv")
    try {
      Files.deleteIfExists(link)
      Files.createSymbolicLink(link, p.getFileName)
    } catch {
      case _: UnsupportedOperationException | _: java.io.IOException =>
        Files.copy(p, link,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  def main(args: Array[String]): Unit = {
    val cfg = parse(args)
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
        .appName("graft-run-queries"), "32", cfg.table)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // J3 broadcast switch: the shared profile defaults to 50 MB; the
    // flag OFF restores Spark's stock 10 MB threshold so the toggle
    // still changes plans (reference: run_queries.py broadcast knob).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      ((if (cfg.broadcastHint) 50L else 10L) * 1024 * 1024).toString)

    val view = registerTable(spark, cfg.table)
    QueryRunner.cacheTable(spark, view, cfg.cache)
    try {
      val results = runDir(spark, cfg, view)
      val out = resolveOutput(cfg)
      writeCsv(out, cfg.engine, results)
      if (cfg.resultsDir.nonEmpty) updateLatest(out)
      println(s"[OK] wrote $out")
    } finally {
      QueryRunner.uncacheTable(spark, view, cfg.cache)
      spark.stop()
    }
  }
}
