package graft.runner

import graft.SparkTestBase
import graft.cli.RunQueries
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class RunQueriesCliSuite extends SparkTestBase {

  private def writeSql(dir: String, name: String, text: String): Unit =
    Files.write(Paths.get(dir, name), text.getBytes("UTF-8"))

  test("runDir: sorted *.sql with {{tbl}} substitution -> 14-col CSV") {
    val spark2 = spark
    import spark2.implicits._
    val tableDir = tmpDir("cli_table")
    (1 to 1000).map(i => (i.toLong, i % 7, i * 1.5)).toDF("id", "k", "v")
      .coalesce(1).write.mode("overwrite").parquet(tableDir)

    val qDir = tmpDir("cli_queries")
    writeSql(qDir, "q2_agg.sql",
      "SELECT k, count(*) AS n FROM {{tbl}} GROUP BY k ORDER BY k")
    writeSql(qDir, "q1_filter.sql",
      "SELECT * FROM {{tbl}} WHERE id < 10 ORDER BY id")
    // a multi-statement stream file: view setup, measured select, teardown
    writeSql(qDir, "q3_view.sql",
      """CREATE OR REPLACE TEMPORARY VIEW cli_v AS
        |  SELECT k, sum(v) AS sv FROM {{tbl}} GROUP BY k;
        |SELECT count(*) AS n FROM cli_v;
        |DROP VIEW cli_v;""".stripMargin)

    val view = RunQueries.registerTable(spark, tableDir, "cli_tbl")
    val cfg = RunQueries.Config(table = tableDir, queriesDir = qDir, warmup = true)
    val results = RunQueries.runDir(spark, cfg, view)

    assert(results.map(_.query) === Seq("q1_filter.sql", "q2_agg.sql", "q3_view.sql"),
      "files must run in sorted order")
    assert(results.find(_.query == "q1_filter.sql").get.metrics.rows === 9)
    assert(results.find(_.query == "q2_agg.sql").get.metrics.rows === 7)
    assert(results.find(_.query == "q3_view.sql").get.metrics.rows === 1)
    assert(results.forall(_.metrics.wallSec > 0))
    assert(results.forall(_.inputFileBytes > 0), "df.inputFiles must resolve sizes")

    val csv = tmpDir("cli_out") + "/results.csv"
    RunQueries.writeCsv(csv, "graft", results)
    val lines = Files.readAllLines(Paths.get(csv))
    assert(lines.get(0) === RunQueries.CsvHeader)
    assert(lines.get(0).split(",").length === 14, "reference CSV is 14 columns")
    assert(lines.size() === 4)
    assert(lines.get(1).split(",", -1).length === 14)
    assert(lines.get(1).startsWith("graft,q1_filter.sql,"))
  }

  test("runDir over a layout table: zone-map skipping shows in files_scanned") {
    val spark2 = spark
    import spark2.implicits._
    val tableDir = tmpDir("cli_layout_tbl")
    val df = (1 to 30000).map(i => (i.toLong, i % 1000, (i % 97) * 1.0))
      .toDF("id", "x", "y")
    graft.layout.LayoutWriter.write(df, tableDir,
      graft.layout.LayoutWriter.LayoutSpec("linear", Seq("x"), numFiles = Some(12)))

    val qDir = tmpDir("cli_layout_q")
    writeSql(qDir, "q_narrow.sql",
      "SELECT count(*) AS c FROM {{tbl}} WHERE x BETWEEN 100 AND 120")
    writeSql(qDir, "q_full.sql", "SELECT count(*) AS c FROM {{tbl}}")

    val view = RunQueries.registerTable(spark, tableDir, "cli_layout")
    val rs = RunQueries.runDir(spark,
      RunQueries.Config(table = tableDir, queriesDir = qDir), view)
    val narrow = rs.find(_.query == "q_narrow.sql").get.metrics
    val full = rs.find(_.query == "q_full.sql").get.metrics
    assert(full.filesScanned == 12, s"full scan saw ${full.filesScanned}")
    assert(narrow.filesScanned < full.filesScanned,
      s"zone-map skipping must show in the CSV: ${narrow.filesScanned} vs ${full.filesScanned}")
  }

  test("parse: flags round-trip and bad input rejected") {
    val c = RunQueries.parse(Array("--table", "/t", "--queries-dir", "/q",
      "--warmup", "--cache", "catalog", "--action", "count",
      "--output-csv", "/tmp/x.csv", "--broadcast-hint"))
    assert(c === RunQueries.Config("/t", "/q", "/tmp/x.csv", warmup = true,
      cache = "catalog", action = "count", broadcastHint = true))
    intercept[IllegalArgumentException](RunQueries.parse(Array("--table", "/t")))
    intercept[IllegalArgumentException](
      RunQueries.parse(Array("--table", "/t", "--queries-dir", "/q", "--cache", "bogus")))
  }

  test("cacheTable modes: none, catalog (CACHE/UNCACHE TABLE), df") {
    val spark2 = spark
    import spark2.implicits._
    (1 to 100).map(i => (i, i * 2)).toDF("a", "b")
      .createOrReplaceTempView("cache_mode_t")

    QueryRunner.cacheTable(spark, "cache_mode_t", "none")
    assert(!spark.catalog.isCached("cache_mode_t"))

    QueryRunner.cacheTable(spark, "cache_mode_t", "catalog")
    assert(spark.catalog.isCached("cache_mode_t"))
    QueryRunner.uncacheTable(spark, "cache_mode_t", "catalog")
    assert(!spark.catalog.isCached("cache_mode_t"))

    QueryRunner.cacheTable(spark, "cache_mode_t", "df")
    assert(spark.catalog.isCached("cache_mode_t"))
    QueryRunner.uncacheTable(spark, "cache_mode_t", "df")
    assert(!spark.catalog.isCached("cache_mode_t"))

    intercept[IllegalArgumentException](
      QueryRunner.cacheTable(spark, "cache_mode_t", "bogus"))
  }

  test("e2e run with --cache catalog: CACHE TABLE spans the query batch (run_queries.py:555-561)") {
    // the main()-body composition (registerTable -> cacheTable ->
    // runDir -> uncacheTable) under catalog mode — closes the L11
    // "catalog not exercised end-to-end" scope note
    val base = tmpDir("cli_cache_catalog")
    val tableDir = s"$base/t.parquet"
    val spark2 = spark
    import spark2.implicits._
    (1 to 500).map(i => (i.toLong, s"v$i", i % 7)).toDF("id", "s", "grp")
      .write.parquet(tableDir)
    val qDir = Paths.get(base, "queries")
    Files.createDirectories(qDir)
    Files.write(qDir.resolve("q1.sql"),
      "SELECT grp, count(*) AS c FROM {{tbl}} GROUP BY grp".getBytes("UTF-8"))
    Files.write(qDir.resolve("q2.sql"),
      "SELECT max(id) AS m FROM {{tbl}}".getBytes("UTF-8"))
    val cfg = RunQueries.Config(table = tableDir, queriesDir = qDir.toString,
      outputCsv = s"$base/out.csv", cache = "catalog")
    val view = RunQueries.registerTable(spark, cfg.table)
    QueryRunner.cacheTable(spark, view, cfg.cache)
    try {
      assert(spark.catalog.isCached(view), "CACHE TABLE must be in effect")
      // the cached plan actually serves the scan: InMemoryRelation in
      // the executed plan of a query against the view
      val plan = spark.sql(s"SELECT count(*) FROM $view")
        .queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan") || plan.contains("InMemoryRelation"),
        s"catalog-cached view should scan the cache:\n$plan")
      val results = RunQueries.runDir(spark, cfg, view)
      assert(results.length == 2)
      assert(results.forall(_.metrics.rows > 0))
    } finally {
      QueryRunner.uncacheTable(spark, view, cfg.cache)
      assert(!spark.catalog.isCached(view))
      spark.catalog.dropTempView(view)
    }
  }

  test("results-dir mode: per-engine tree + latest.csv symlink") {
    val base = tmpDir("cli_results")
    val cfg = RunQueries.Config(table = "t", queriesDir = "q",
      engine = "graft_zorder", resultsDir = base)
    val out = RunQueries.resolveOutput(cfg)
    assert(out.startsWith(s"$base/graft_zorder/"), out)
    assert(out.endsWith(".csv"))
    Files.write(Paths.get(out), "engine,query\ngraft_zorder,q1.sql".getBytes("UTF-8"))
    RunQueries.updateLatest(out)
    val latest = Paths.get(base, "graft_zorder", "latest.csv")
    assert(Files.exists(latest), "latest.csv must exist")
    assert(new String(Files.readAllBytes(latest), "UTF-8")
      .startsWith("engine,query"))
    // a second run re-points latest at the newer csv
    val out2 = Paths.get(base, "graft_zorder", "99999999_999999.csv")
    Files.write(out2, "engine,query\ngraft_zorder,q2.sql".getBytes("UTF-8"))
    RunQueries.updateLatest(out2.toString)
    assert(new String(Files.readAllBytes(latest), "UTF-8").contains("q2.sql"))
    // plain --output-csv mode is untouched
    assert(RunQueries.resolveOutput(
      RunQueries.Config(table = "t", queriesDir = "q", outputCsv = "x.csv")) == "x.csv")
  }
}
