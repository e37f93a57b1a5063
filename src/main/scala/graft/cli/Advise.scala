package graft.cli

import org.apache.spark.sql.SparkSession

/** Layout-advisor CLI — the end-to-end form of the reference's
  * sql_layout_toolkit notebook flow (V1–V5, sql_layout_toolkit.py:
  * 140-1205) plus the round-13 layout-FAMILY decision (V6): read a
  * workload of `.sql` files, profile the target table for the
  * cardinality/kind/range signals the scoring needs, and emit stacked
  * table recommendations, the best column combos, and the
  * linear-vs-curve family advice with its measured-band reasoning.
  *
  * Usage: runMain graft.cli.Advise <sfDir> <workloadDir> [table] [k]
  *
  *  - `workloadDir`: every `*.sql` file is one workload query (the
  *    wlg's G8 emit shape).
  *  - `table` (optional): target table name; defaults to the
  *    advisor's top-ranked table.
  *  - `k` (default 2): layout key width.
  *
  * Writes `<workloadDir>/advice.json` and prints it.
  */
object Advise {

  def run(spark: SparkSession, sfDir: String, workloadDir: String,
      table: Option[String] = None, k: Int = 2): String = {
    import graft.advisor.Advisor
    val dir = java.nio.file.Paths.get(workloadDir)
    val sqlFiles = java.nio.file.Files.list(dir).toArray
      .map(_.toString).filter(_.endsWith(".sql")).sorted.toSeq
    require(sqlFiles.nonEmpty, s"no .sql files in $workloadDir")
    val sqls = sqlFiles.map(p =>
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
        java.nio.charset.StandardCharsets.UTF_8).trim.stripSuffix(";"))

    val events0 = sqls.zipWithIndex.flatMap { case (q, i) =>
      Advisor.extract(spark, q, i)
    }
    require(events0.nonEmpty, "workload has no classifiable predicates")
    // wlg-emitted workloads read a placeholder view (`tbl`, the
    // RunQueries {{tbl}} convention): when the caller names the real
    // table and the workload references exactly one relation, alias
    // that relation's events onto the real name
    val events = table match {
      case Some(t) =>
        val rels = events0.map(_.table).filter(_.nonEmpty).distinct
        if (rels.size == 1 && rels.head != t)
          events0.map(e => if (e.table == rels.head) e.copy(table = t) else e)
        else events0
      case None => events0
    }

    // pick the target table BEFORE profiling (ranking by events alone),
    // then profile it once for the kind/cardinality/range multipliers
    val pre = Advisor.recommendTables(events)
    val target = table.getOrElse(
      pre.headOption.map(_.table).filter(_.nonEmpty).getOrElse(
        sys.error("could not attribute a target table; pass one explicitly")))
    val stats = graft.profile.Profiler.profile(
      graft.Tables.load(spark, sfDir, target))
    val kinds = stats.columns.map(c => c.name.toLowerCase -> (c.kind match {
      case "numeric" => "numeric"
      case "datetime" => "datetime"
      case other => other
    })).toMap
    val uniqueRatio = stats.columns.map(c =>
      c.name.toLowerCase -> (if (stats.rows == 0) 0.0
        else c.cardinality.toDouble / stats.rows)).toMap
    val colRanges = stats.columns.flatMap(c =>
      for { mn <- c.min; mx <- c.max } yield c.name.toLowerCase -> (mn, mx)).toMap

    val tableRecs = Advisor.recommendTables(events, kinds, uniqueRatio)
    // family + combos score only the queries that read the target table
    // (predicates of other tables must not pollute its band statistics)
    val targetQueries = events.groupBy(_.queryId).collect {
      case (qid, evs) if evs.exists(e => e.table == target || e.table.isEmpty) => qid
    }.toSet
    val targetSqls = sqls.zipWithIndex.collect {
      case (q, i) if targetQueries(i) => q
    }
    val combos = Advisor.recommendCombos(
      events.filter(e => e.table == target || e.table.isEmpty),
      k, kinds, uniqueRatio)
    val layout = Advisor.recommendLayout(
      spark, targetSqls, colRanges, kinds, uniqueRatio, k)

    def jStr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val json =
      s"""{
 "table": ${jStr(target)},
 "layout": {
  "family": ${jStr(layout.layout)},
  "cols": [${layout.cols.map(jStr).mkString(", ")}],
  "mean_band_fraction": ${layout.meanBandFraction.map(f3).getOrElse("null")},
  "prune_coverage": ${f3(layout.pruneCoverage)},
  "reason": ${jStr(layout.reason)}
 },
 "combos": [${combos.map(c =>
        s"""{"cols": [${c.columns.map(jStr).mkString(", ")}], "score": ${f3(c.score)}, "coverage": ${f3(c.coverage)}}""")
        .mkString(",\n  ")}],
 "tables": [${tableRecs.map(t =>
        s"""{"table": ${jStr(t.table)}, "score": ${f3(t.layoutOpportunityScore)}, "multi_col_eligible": ${t.eligibleForMultiColLayout}, "top_columns": [${t.topColumns.map(jStr).mkString(", ")}]}""")
        .mkString(",\n  ")}]
}"""
    java.nio.file.Files.write(dir.resolve("advice.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    json
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // `--tpch <outDir> [table]`: materialize the 22 RQ6 stream texts as
    // the workload (first statement of the one multi-statement script —
    // Q15's view definition, which is where its lineitem predicate
    // lives) and advise on the named table. This reproduces the RQ6
    // finding from the WORKLOAD alone: the full TPC-H stream mix is
    // full-scan-dominated on lineitem, so the advisor must steer away
    // from curves (r17 VERDICT Next #6) — the measured counterpart is
    // results/rq6_sf10 (hilbert 0.97x overall, Q1 0.70x).
    val tpchMode = args.lift(1).contains("--tpch")
    val workloadDir =
      if (tpchMode) {
        val d = java.nio.file.Paths.get(args.lift(2).getOrElse("results/advise_rq6"), "wl")
        java.nio.file.Files.createDirectories(d)
        graft.queries.TpchQueries.streamScripts.toSeq.sortBy(_._1)
          .foreach { case (n, txt) =>
            val first = txt.split(";").map(_.trim).filter(_.nonEmpty).head
            java.nio.file.Files.write(d.resolve(f"q$n%02d.sql"),
              (first + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
        d.toString
      } else args.lift(1).getOrElse(
        sys.error("usage: Advise <sfDir> <workloadDir> [table] [k] | Advise <sfDir> --tpch <outDir> [table]"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val table = if (tpchMode) Some(args.lift(3).getOrElse("lineitem")) else args.lift(2)
    val k = (if (tpchMode) None else args.lift(3)).map(_.toInt).getOrElse(2)
    try println(run(spark, sfDir, workloadDir, table, k))
    finally {
      graft.runner.Materialize.releaseAllFast(spark)
      spark.stop()
    }
  }
}
