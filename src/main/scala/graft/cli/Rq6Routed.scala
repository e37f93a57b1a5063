package graft.cli

import org.apache.spark.sql.SparkSession
import graft.layout.LayoutWriter
import graft.layout.LayoutWriter.LayoutSpec
import graft.runner.{MetricsListener, QueryRunner, SqlScript}
import graft.queries.TpchQueries
import graft.table.{LayoutRouter, SfcTable}

/** RQ6 with PER-QUERY LAYOUT ROUTING (round-19, VERDICT Next #4): the
  * reference materializes one table copy per layout and registers them
  * side by side (tpch_all_runner.py:143-165) but every stream runs
  * against ONE fixed choice — and rq6_sf10_bb measured why that loses:
  * TPC-H Q16 reads MORE files on hilbert than baseline (568 vs 448)
  * and Q3 stays <1×, while Q6 gains 1.63×. This protocol keeps ALL
  * variants materialized and, in the `routed` arm, sends each stream
  * query to the variant whose zone maps prune the most bytes for ITS
  * predicates ([[graft.table.LayoutRouter]] — one optimizer pass + V
  * driver-side manifest prunes per query, ~0 with the read cache).
  *
  * Output: <out>/summary.json with per-arm stream totals, per-query
  * seconds/files/bytes, and the routed arm's per-query variant choices.
  * The headline check: routed stream total ≤ every single-layout total
  * (up to noise) — the router can only tie or beat a fixed variant on
  * bytes, which is the quantity it optimizes.
  *
  * Usage: runMain graft.cli.Rq6Routed [sfDir] [outDir] [scenario]
  *   [nStreams] [filesPerTable]
  */
object Rq6Routed {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val out = args.lift(1).getOrElse("results/rq6_routed")
    val scenarioName = args.lift(2).getOrElse("L1_O1")
    val nStreams = args.lift(3).map(_.toInt).getOrElse(1)
    val filesPerTable = args.lift(4).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus, sfDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, out, scenarioName, nStreams, filesPerTable)
    spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, out: String,
      scenarioName: String, nStreams: Int, filesPerTable: Int,
      warm: Boolean = true): Unit = {
    val layouts = Seq("no_layout", "zorder", "hilbert")
    val cfgs = Rq6.scenario(scenarioName)
    val work = java.nio.file.Files.createTempDirectory("graft_rq6r").toString
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)
    try {
      // ---- build EVERY variant up front (the routed arm needs them all
      // on disk at once — the one structural difference vs cli/Rq6,
      // which builds and drops one family at a time)
      val dirs: Map[(String, String), String] = (for {
        cfg <- cfgs; layout <- layouts
      } yield {
        val dir = s"$work/${cfg.table}_$layout"
        if (layout == "no_layout")
          LayoutWriter.write(
            spark.read.parquet(s"$sfDir/${cfg.table}.parquet"), dir,
            LayoutSpec("baseline", Nil, numFiles = Some(filesPerTable),
              recordKeys = cfg.recordKeys,
              precombineCol = Some(cfg.precombine),
              partitionBy = cfg.partitionBy),
            extraStatsCols = cfg.sortCols)
        else
          LayoutWriter.write(
            spark.read.parquet(s"$sfDir/${cfg.table}.parquet"), dir,
            LayoutSpec(layout, cfg.sortCols, numFiles = Some(filesPerTable),
              recordKeys = cfg.recordKeys,
              precombineCol = Some(cfg.precombine),
              partitionBy = cfg.partitionBy))
        (cfg.table, layout) -> dir
      }).toMap
      val laidTables = cfgs.map(_.table).toSet
      for (t <- graft.Tables.tpch if !laidTables.contains(t))
        spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)

      def registerArm(layout: String): Unit =
        for (cfg <- cfgs)
          SfcTable.open(spark, dirs((cfg.table, layout)))
            .createOrReplaceTempView(cfg.table)

      val arms = layouts :+ "routed"
      val rows = Seq.newBuilder[String]
      def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
      val armTotals = scala.collection.mutable.LinkedHashMap[String, Double]()
      var routeSec = 0.0
      // the routed arm's per-query registration, shared by the warm and
      // measured loops so the warm pass heats the SAME variants the
      // measured streams will read (warming a fixed variant instead
      // hands the routed arm a cold page cache for every query routed
      // elsewhere). Routing time is accounted separately (route_sec).
      // per-table routing decision + every variant's estimate, so the
      // artifact shows WHY each choice was made (est = kept bytes/files
      // per variant keyed by the arm's layout name)
      case class Routed(layout: String,
          est: Seq[(String, LayoutRouter.Choice)])
      def routeAndRegister(script: String, timed: Boolean): Map[String, Routed] =
        cfgs.map { cfg =>
          val variants = layouts.map(l => dirs((cfg.table, l)))
          val t0 = System.nanoTime()
          val schema = spark.read.parquet(variants.head).schema
          val preds = LayoutRouter.zonePreds(spark, script, schema)
          val est = LayoutRouter.choices(variants, preds)
          val c = LayoutRouter.pick(est)
          if (timed) routeSec += (System.nanoTime() - t0) / 1e9
          SfcTable.open(spark, c.dir).createOrReplaceTempView(cfg.table)
          // record the ARM name (no_layout/zorder/hilbert) — the manifest
          // layout name of the baseline variant is "baseline", which
          // would leave the artifact keyed two different ways
          cfg.table -> Routed(layouts(variants.indexOf(c.dir)), layouts.zip(est))
        }.toMap
      // warm pass: JIT + page cache, every arm up front so no measured
      // run sees cold codegen or cold files
      if (warm) for (arm <- arms; q <- 1 to 22)
        try {
          val script = TpchQueries.streamScripts(q)
          if (arm == "routed") routeAndRegister(script, timed = false)
          else registerArm(arm)
          SqlScript.run(spark, script).count()
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[rq6r] warm $arm q$q failed: ${e.getMessage}") }
      // measured loop: arms INTERLEAVED per query, not arm-sequential.
      // The first artifact ran each arm as a 90+-second block an hour
      // apart and host drift (±30 % on identical no_layout streams)
      // buried the routing signal; running all four arms back-to-back
      // per (stream, query) makes every comparison paired — drift at
      // time T hits each arm of that pair equally. Arm order rotates
      // by query index so no arm systematically runs first or last.
      arms.foreach(armTotals(_) = 0.0)
      var qIdx = 0
      for (i <- 1 to math.min(nStreams, Rq6.StreamOrders.length)) {
        for (q <- Rq6.StreamOrders(i - 1)) {
          val script = TpchQueries.streamScripts(q)
          val rot = qIdx % arms.length
          qIdx += 1
          for (arm <- arms.drop(rot) ++ arms.take(rot)) {
            val chosen: Map[String, Routed] =
              if (arm != "routed") { registerArm(arm); Map.empty }
              else routeAndRegister(script, timed = true)
            val m = QueryRunner.run(spark, SqlScript.run(spark, script),
              s"$arm-s$i-q$q", listener = Some(listener), action = "count")
            armTotals(arm) += m.wallSec
            val chosenJson = chosen.map { case (t, r) =>
              val est = r.est.map { case (l, c) =>
                s""""$l":[${c.bytesKept},${c.filesKept}]"""
              }.mkString("{", ",", "}")
              s""""$t":{"layout":"${r.layout}","est_bytes_files":$est}"""
            }.mkString("{", ",", "}")
            rows += s"""{"arm":"$arm","stream":$i,"q":$q,""" +
              s""""sec":${f3(m.wallSec)},"files":${m.filesScanned},""" +
              s""""bytes":${m.bytesScanned},"routed":$chosenJson}"""
          }
        }
      }
      for (arm <- arms)
        println(f"[rq6r] arm $arm%-10s total ${armTotals(arm)}%8.2f s")
      val totalsJson = armTotals.map { case (a, t) => s""""$a":${f3(t)}""" }
        .mkString("{", ",", "}")
      val json = s"""{"scenario":"$scenarioName","sf_dir":"$sfDir",""" +
        s""""streams":${math.min(nStreams, Rq6.StreamOrders.length)},""" +
        s""""files_per_table":$filesPerTable,"arm_totals":$totalsJson,""" +
        s""""route_sec":${f3(routeSec)},""" +
        s""""queries":[${rows.result().mkString(",")}]}"""
      val op = java.nio.file.Paths.get(out, "summary.json")
      java.nio.file.Files.createDirectories(op.getParent)
      java.nio.file.Files.writeString(op, json + "\n")
      println(json.take(400))
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      graft.Tables.tpch.foreach(t => spark.catalog.dropTempView(t))
      Scenario.deleteRec(new java.io.File(work))
    }
  }
}
