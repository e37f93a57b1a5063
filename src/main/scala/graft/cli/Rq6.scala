package graft.cli

import org.apache.spark.sql.SparkSession
import graft.layout.LayoutWriter
import graft.layout.LayoutWriter.LayoutSpec
import graft.runner.{MetricsListener, QueryRunner, SqlScript}
import graft.queries.TpchQueries

/** RQ6 — full TPC-H query STREAMS over LAID-OUT tables (the last
  * reference protocol without a measured repo counterpart, r16 VERDICT
  * "What's missing #1"). The reference runs the 10 dbgen streams
  * against Hudi layout variants of the 8-table schema
  * (scripts/run_RQ_6_matrix.sh:1-24 → scripts/tpch_all/run_queries.sh
  * → lakehouse_op/tpch_all_runner.py): per scenario, lineitem and/or
  * orders are rewritten under a sort config while the other tables load
  * plain, and every stream's 22 queries are measured with per-query
  * bytes/files. rq1/rq4 quantify what curves do to SELECTIVE scans;
  * RQ6 asks what they do to full join-heavy TPC-H — including the
  * expected null result on join-bound queries (measuring that is the
  * point).
  *
  * Scenario configs mirror the reference's matrix
  * (run_RQ_6_matrix.sh:46-230): lineitem sort variants L1
  * (l_shipdate,l_receiptdate), L2 (l_orderkey,l_suppkey), L3
  * (l_quantity,l_extendedprice); orders sorts O1
  * (o_orderdate,o_orderstatus), O2 (o_orderdate,o_orderpriority), O3
  * (o_custkey,o_orderdate); record keys l_orderkey+l_linenumber /
  * o_orderkey with precombine l_commitdate / o_orderdate. The
  * reference's hive partitioning (l_returnflag,l_linestatus ×
  * o_orderstatus,o_orderpriority) is kept. Layout families: no_layout
  * (plain parquet baseline) vs linear/zorder/hilbert; laid-out tables
  * are registered through [[graft.table.SfcTable.open]] so zone-map
  * file skipping reaches arbitrary stream SQL at planning time.
  *
  * Streams: the sandbox has no dbgen/qgen, so stream files are
  * generated from the engine's own TPC-H texts
  * ([[TpchQueries.streamScripts]]) in the TPC-H specification's
  * published stream permutation order (Appendix A ordering table) —
  * same 22 queries per stream, spec ordering, fixed validation
  * parameters (qgen's per-stream parameter draws need dbgen's seed
  * tables; the honest stand-in keeps parameters fixed — the same
  * caveat tools/ScaleUp documents for data).
  *
  * Output matches the reference runner's layout so its analysis
  * notebooks would parse ours unchanged (tpch_all_runner.py:212-275):
  * `<resultsRoot>/<layout>/<stream>/<timestamp>/results.csv` plus a
  * `latest` symlink per stream, one header-compatible row per query.
  *
  * Usage: runMain graft.cli.Rq6 [sfDir] [resultsRoot] [scenario]
  *   [layouts] [streams] [filesPerTable]
  *   scenario ∈ L1_O1 … L3_O3, L4_O1 … L4_O3 (lineitem only),
  *   L5_O1 … L5_O3 (orders only); default L1_O1.
  */
object Rq6 {

  /** TPC-H spec Appendix A stream orderings, streams 1-10 (stream 0 is
    * the power run). Each row is a permutation of queries 1..22.
    */
  val StreamOrders: Seq[Seq[Int]] = Seq(
    Seq(21, 3, 18, 5, 11, 7, 6, 20, 17, 12, 16, 15, 13, 10, 2, 8, 14, 19, 9, 22, 1, 4),
    Seq(6, 17, 14, 16, 19, 10, 9, 2, 15, 8, 5, 22, 12, 7, 13, 18, 1, 4, 20, 3, 11, 21),
    Seq(8, 5, 4, 6, 17, 7, 1, 18, 22, 14, 9, 10, 15, 11, 20, 2, 21, 19, 13, 16, 12, 3),
    Seq(5, 21, 14, 19, 15, 17, 12, 6, 4, 9, 8, 16, 11, 2, 10, 18, 1, 13, 7, 22, 3, 20),
    Seq(21, 15, 4, 6, 7, 16, 19, 18, 14, 22, 11, 13, 3, 1, 2, 5, 8, 20, 12, 17, 10, 9),
    Seq(10, 3, 15, 13, 6, 8, 9, 7, 4, 11, 22, 18, 12, 1, 5, 16, 2, 14, 19, 20, 17, 21),
    Seq(18, 8, 20, 21, 2, 4, 22, 17, 1, 11, 9, 19, 3, 13, 5, 7, 10, 16, 6, 14, 15, 12),
    Seq(19, 1, 15, 17, 5, 8, 9, 12, 14, 7, 4, 3, 20, 16, 6, 22, 10, 13, 2, 21, 18, 11),
    Seq(8, 13, 2, 20, 17, 3, 6, 21, 18, 11, 19, 10, 15, 4, 22, 1, 7, 12, 9, 14, 5, 16),
    Seq(6, 15, 18, 17, 12, 1, 7, 2, 22, 13, 21, 10, 14, 9, 3, 16, 20, 19, 11, 4, 8, 5))

  /** One laid-out table's config (reference per-table scenario keys). */
  case class TableCfg(table: String, sortCols: Seq[String],
      recordKeys: Seq[String], precombine: String, partitionBy: Seq[String])

  val LineitemKeys = Seq("l_orderkey", "l_linenumber")
  val LineitemPart = Seq("l_returnflag", "l_linestatus")
  val OrdersPart = Seq("o_orderstatus", "o_orderpriority")

  /** The driver's reduced lineitem schema has no l_receiptdate /
    * l_commitdate (TESTDATA.md), so the reference's L1 sort
    * (l_shipdate,l_receiptdate) maps to (l_shipdate,l_discount) — the
    * date-led pair TPC-H Q6 actually predicates on — and the
    * precombine l_commitdate maps to l_shipdate. L2/L3 columns exist
    * verbatim.
    */
  val LineitemSorts = Map(
    "L1" -> Seq("l_shipdate", "l_discount"),
    "L2" -> Seq("l_orderkey", "l_suppkey"),
    "L3" -> Seq("l_quantity", "l_extendedprice"),
    "L5" -> Nil) // L5_Ox: orders-only scenarios
  val OrdersSorts = Map(
    "O1" -> Seq("o_orderdate", "o_orderstatus"),
    "O2" -> Seq("o_orderdate", "o_orderpriority"),
    "O3" -> Seq("o_custkey", "o_orderdate"))

  /** Scenario name → the tables it lays out. L4_Ox uses the Lx sort
    * matching its O index (the reference's L4 set varies the LINEITEM
    * sort across O1..O3 with no orders layout, run_RQ_6_matrix.sh:180-
    * 205); L5_Ox lays out only orders.
    */
  def scenario(name: String): Seq[TableCfg] = {
    val parts = name.split("_")
    require(parts.length == 2, s"scenario '$name' (want e.g. L1_O1)")
    val (l, o) = (parts(0), parts(1))
    val li = l match {
      case "L4" =>
        // L4_O1/O2/O3 carry lineitem sorts L1/L2/L3 respectively; any
        // other O index must fail fast, not silently run a mislabeled
        // sort (LineitemSorts has exactly L1-L3, so an out-of-range
        // index throws NoSuchElementException like every other typo)
        val sortIdx = "L" + o.drop(1)
        require(Set("L1", "L2", "L3")(sortIdx),
          s"scenario '$name': L4 pairs only with O1..O3")
        Some(TableCfg("lineitem", LineitemSorts(sortIdx), LineitemKeys,
          "l_shipdate", LineitemPart))
      case "L5" => None
      case lx =>
        Some(TableCfg("lineitem", LineitemSorts(lx), LineitemKeys,
          "l_shipdate", LineitemPart))
    }
    val or =
      if (l == "L4") None
      else Some(TableCfg("orders", OrdersSorts(o), Seq("o_orderkey"),
        "o_orderdate", OrdersPart))
    (li.toSeq ++ or.toSeq)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val resultsRoot = args.lift(1).getOrElse("results/rq6")
    val scenarioName = args.lift(2).getOrElse("L1_O1")
    val layouts = args.lift(3).map(_.split(",").toSeq)
      .getOrElse(Seq("no_layout", "linear", "zorder", "hilbert"))
    val nStreams = args.lift(4).map(_.toInt).getOrElse(10)
    val filesPerTable = args.lift(5).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus, sfDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, resultsRoot, scenarioName, layouts, nStreams,
      filesPerTable)
    println(s"[rq6] done: scenario $scenarioName, layouts " +
      s"${layouts.mkString("/")}, ${math.min(nStreams, StreamOrders.length)} " +
      s"streams, sf dir $sfDir")
    spark.stop()
  }

  /** The streams × layouts protocol body ([[main]] wraps it; suites call
    * it directly on the shared test session with `warm = false`).
    */
  def run(spark: SparkSession, sfDir: String, resultsRoot: String,
      scenarioName: String, layouts: Seq[String], nStreams: Int,
      filesPerTable: Int, warm: Boolean = true): Unit = {
    val cfgs = scenario(scenarioName)
    val work = java.nio.file.Files.createTempDirectory("graft_rq6").toString
    val ts = new java.text.SimpleDateFormat("yyyyMMdd_HHmmss")
      .format(new java.util.Date())
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)

    // write stream files once (shared across layouts): qgen-style
    // stream_N/qXX.sql consumed via SqlScript, like the reference's
    // workload dirs
    val streamsRoot = java.nio.file.Paths.get(work, "streams")
    for ((order, i) <- StreamOrders.take(nStreams).zipWithIndex) {
      val d = streamsRoot.resolve(s"stream_${i + 1}")
      java.nio.file.Files.createDirectories(d)
      for (q <- order)
        java.nio.file.Files.write(d.resolve(f"q$q%02d.sql"),
          TpchQueries.streamScripts(q)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

    try {
      for (layout <- layouts) {
        // ---- load: lay out the scenario's tables under this family ----
        val laidDirs: Map[String, String] = cfgs.map { cfg =>
          val dir = s"$work/${cfg.table}_$layout"
          if (layout == "no_layout") {
            // baseline still gets a manifest (stats-only, unsorted) so
            // bytes/files metrics come from the identical scan path
            LayoutWriter.write(
              spark.read.parquet(s"$sfDir/${cfg.table}.parquet"), dir,
              LayoutSpec("baseline", Nil, numFiles = Some(filesPerTable),
                recordKeys = cfg.recordKeys,
                precombineCol = Some(cfg.precombine),
                partitionBy = cfg.partitionBy),
              extraStatsCols = cfg.sortCols)
          } else {
            LayoutWriter.write(
              spark.read.parquet(s"$sfDir/${cfg.table}.parquet"), dir,
              LayoutSpec(layout, cfg.sortCols,
                numFiles = Some(filesPerTable),
                recordKeys = cfg.recordKeys,
                precombineCol = Some(cfg.precombine),
                partitionBy = cfg.partitionBy))
          }
          cfg.table -> dir
        }.toMap

        // ---- register: laid-out tables through the zone-map FileIndex,
        // the rest plain (reference registers every materialized table,
        // tpch_all_runner.py:143-165)
        for (t <- graft.Tables.tpch) {
          val df = laidDirs.get(t) match {
            case Some(dir) => graft.table.SfcTable.open(spark, dir)
            case None => spark.read.parquet(s"$sfDir/$t.parquet")
          }
          df.createOrReplaceTempView(t)
        }

        // unmeasured warm pass (one per layout): JIT + page cache, so
        // stream_1 isn't structurally slower than stream_10
        if (warm) for (q <- 1 to 22)
          try SqlScript.run(spark, TpchQueries.streamScripts(q)).count()
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[rq6] warm q$q failed: ${e.getMessage}") }

        // ---- streams ----
        for (i <- 1 to math.min(nStreams, StreamOrders.length)) {
          val streamDir = streamsRoot.resolve(s"stream_$i")
          val outDir = java.nio.file.Paths.get(
            resultsRoot, layout, s"stream_$i", ts)
          java.nio.file.Files.createDirectories(outDir)
          val rows = Seq.newBuilder[String]
          rows += "engine,stream,query,elapsedTime_s,executorRunTime_s," +
            "executorCpuTime_s,files_scanned,bytes_scanned,records_read,rows"
          // run in the STREAM'S order, not directory order — the stream
          // files have fixed names, so resolve each directly (a
          // Files.list here would also leak its stream handle)
          val order = StreamOrders(i - 1)
          for (q <- order) {
            val qf = streamDir.resolve(f"q$q%02d.sql")
            val script = new String(
              java.nio.file.Files.readAllBytes(qf),
              java.nio.charset.StandardCharsets.UTF_8)
            val name = s"$layout-stream_$i-q$q"
            val m = QueryRunner.run(spark,
              SqlScript.run(spark, script), name,
              listener = Some(listener), action = "count")
            rows += f"$layout,stream_$i,${qf.getFileName},${m.wallSec}%.3f," +
              f"${m.executorRunTimeMs / 1000.0}%.3f," +
              f"${m.executorCpuTimeNs / 1e9}%.3f," +
              f"${m.filesScanned},${m.bytesScanned},${m.recordsRead},${m.rows}"
          }
          java.nio.file.Files.write(outDir.resolve("results.csv"),
            rows.result().mkString("\n").getBytes(
              java.nio.charset.StandardCharsets.UTF_8))
          // reference-compatible `latest` symlink (tpch_all_runner.py:175-183)
          val latest = outDir.getParent.resolve("latest")
          try {
            java.nio.file.Files.deleteIfExists(latest)
            java.nio.file.Files.createSymbolicLink(latest, outDir.getFileName)
          } catch { case scala.util.control.NonFatal(_) => () }
          println(s"[rq6] $layout stream_$i -> ${outDir.resolve("results.csv")}")
        }

        // drop this family's laid-out table copies before writing the
        // next — at sf10 each is multi-GB, and a 4-layout run would
        // otherwise hold 4 copies of lineitem+orders in /tmp at once
        laidDirs.values.foreach(d => Scenario.deleteRec(new java.io.File(d)))
      }
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      // the tpch temp views registered above point into `work` — drop
      // them before deleting it, or a later query on the shared session
      // (suites call run() directly) hits FileNotFoundException
      graft.Tables.tpch.foreach(t => spark.catalog.dropTempView(t))
      Scenario.deleteRec(new java.io.File(work)) // stream files + any partial layout
    }
  }
}
