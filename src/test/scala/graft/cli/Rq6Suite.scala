package graft.cli

import org.scalatest.funsuite.AnyFunSuite

/** RQ6 protocol pieces that don't need a cluster run: stream-order
  * validity, scenario table configs, and stream-script completeness.
  * The full streams × layouts run is the results/rq6 artifact
  * (runMain graft.cli.Rq6); a 2-stream smoke over a layout subset runs
  * in RunQueriesCliSuite.
  */
class Rq6Suite extends AnyFunSuite {

  test("stream orders: 10 streams, each a permutation of queries 1..22") {
    assert(Rq6.StreamOrders.length == 10)
    for ((o, i) <- Rq6.StreamOrders.zipWithIndex) {
      assert(o.sorted == (1 to 22), s"stream ${i + 1} is not a permutation: $o")
    }
    // orders genuinely differ (protocol point: measured order varies)
    assert(Rq6.StreamOrders.distinct.length == 10)
  }

  test("streamScripts covers all 22 queries and q15 is the 3-statement file") {
    assert(graft.queries.TpchQueries.streamScripts.keySet == (1 to 22).toSet)
    val q15 = graft.queries.TpchQueries.streamScripts(15)
    val stmts = graft.runner.SqlScript.split(q15)
    assert(stmts.length == 3, s"q15 stream file has ${stmts.length} statements")
    assert(graft.runner.SqlScript.mainStatementIndex(stmts) == 1)
  }

  test("scenario configs mirror the reference matrix") {
    // L1_O1: both tables, reference sorts/keys/partitions
    val both = Rq6.scenario("L1_O1")
    assert(both.map(_.table) == Seq("lineitem", "orders"))
    val li = both.head
    assert(li.sortCols == Seq("l_shipdate", "l_discount") &&
      li.recordKeys == Seq("l_orderkey", "l_linenumber") &&
      li.precombine == "l_shipdate" &&
      li.partitionBy == Seq("l_returnflag", "l_linestatus"))
    val or = both(1)
    assert(or.sortCols == Seq("o_orderdate", "o_orderstatus") &&
      or.recordKeys == Seq("o_orderkey") && or.precombine == "o_orderdate")
    // L4_O2 is lineitem-only with the L2 sort (run_RQ_6_matrix.sh:185-191)
    val l4 = Rq6.scenario("L4_O2")
    assert(l4.map(_.table) == Seq("lineitem") &&
      l4.head.sortCols == Seq("l_orderkey", "l_suppkey"))
    // L5_O3 is orders-only
    val l5 = Rq6.scenario("L5_O3")
    assert(l5.map(_.table) == Seq("orders") &&
      l5.head.sortCols == Seq("o_custkey", "o_orderdate"))
    intercept[Exception](Rq6.scenario("bogus"))
    // L4 pairs only with O1..O3 — a typo like L4_O4 must fail fast,
    // not silently run a mislabeled lineitem sort
    intercept[Exception](Rq6.scenario("L4_O4"))
    // an unknown sort index fails fast too
    intercept[Exception](Rq6.scenario("L9_O1"))
  }
}

/** End-to-end smoke of the streams runner: one stream, two layout
  * families, sf0.001 — pins the reference-compatible results tree
  * (`<root>/<layout>/<stream>/<ts>/results.csv` + `latest` symlink,
  * tpch_all_runner.py:212-275) and that every one of the 22 stream
  * queries executes against the laid-out hive-partitioned views.
  */
class Rq6SmokeSuite extends graft.SparkTestBase {

  test("Rq6.run: 1 stream x {no_layout, zorder} at sf0.001 -> " +
      "reference-shaped results tree") {
    val out = tmpDir("rq6_smoke")
    Rq6.run(spark, "/root/testdata/sf0.001", out, "L1_O1",
      Seq("no_layout", "zorder"), nStreams = 1, filesPerTable = 4,
      warm = false)
    for (layout <- Seq("no_layout", "zorder")) {
      val streamDir = java.nio.file.Paths.get(out, layout, "stream_1")
      val latest = streamDir.resolve("latest")
      assert(java.nio.file.Files.isSymbolicLink(latest), s"$latest missing")
      val csv = latest.resolve("results.csv")
      val lines = java.nio.file.Files.readAllLines(csv)
      assert(lines.size == 23, s"$layout: ${lines.size} lines")
      assert(lines.get(0).startsWith("engine,stream,query,elapsedTime_s"))
      val rows = lines.subList(1, lines.size)
      rows.forEach { r =>
        val cs = r.split(",")
        assert(cs(0) == layout && cs(1) == "stream_1")
        assert(cs(3).toDouble > 0, s"elapsed must be >0: $r")
      }
      // stream_1's ordering (spec Appendix A), not directory order
      val got = rows.subList(0, 3)
      assert(got.get(0).contains("q21.sql") && got.get(1).contains("q03.sql")
        && got.get(2).contains("q18.sql"), s"order wrong: $got")
    }
    // identical stream, identical parameters: per-query row counts agree
    // between the plain and laid-out runs (layout changes bytes, not
    // results)
    def rowsCol(layout: String): Seq[String] = {
      import scala.jdk.CollectionConverters._
      val csv = java.nio.file.Paths.get(out, layout, "stream_1", "latest",
        "results.csv")
      java.nio.file.Files.readAllLines(csv).asScala.toSeq.drop(1)
        .map(l => l.split(",").last)
    }
    assert(rowsCol("no_layout") == rowsCol("zorder"))
  }
}
