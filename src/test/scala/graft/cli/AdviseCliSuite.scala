package graft.cli

import graft.SparkTestBase

/** End-to-end advisor CLI (V1–V6): .sql workload + profiled table →
  * stacked table recs, combos, and the layout-family decision.
  */
class AdviseCliSuite extends SparkTestBase {

  private def writeWorkload(dir: String, sqls: Seq[String]): Unit =
    sqls.zipWithIndex.foreach { case (q, i) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, f"q$i%03d.sql"),
        q.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

  test("fine two-column band workload over lineitem yields a curve on the profiled ranges") {
    val wl = tmpDir("advise_fine")
    writeWorkload(wl, Seq(
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_quantity BETWEEN 24 AND 25 AND l_extendedprice BETWEEN 30000 AND 32000;",
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_quantity BETWEEN 10 AND 11 AND l_extendedprice BETWEEN 50000 AND 52000;",
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_quantity BETWEEN 40 AND 41 AND l_extendedprice BETWEEN 10000 AND 12000;"))
    val json = Advise.run(spark, "/root/testdata/sf0.001", wl)
    graft.runner.Materialize.releaseAll()
    assert(json.contains("\"table\": \"lineitem\""), json)
    // ~2% bands are S1-width: the round-14 finest-band branch picks
    // hilbert here (measured 5.64x vs zorder 5.28x at sf16 S1)
    assert(json.contains("\"family\": \"hilbert\""), json)
    assert(json.contains("l_quantity") && json.contains("l_extendedprice"), json)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(wl, "advice.json")))
  }

  test("coarse single-column workload yields linear; explicit table override honored") {
    val wl = tmpDir("advise_coarse")
    writeWorkload(wl, Seq(
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_quantity BETWEEN 10 AND 30;",
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_quantity BETWEEN 20 AND 40;"))
    val json = Advise.run(spark, "/root/testdata/sf0.001", wl, table = Some("lineitem"))
    graft.runner.Materialize.releaseAll()
    assert(json.contains("\"family\": \"linear\""), json)
    assert(json.contains("\"cols\": [\"l_quantity\"]"), json)
  }

  test("wlg-style `tbl` placeholder workloads alias onto the named table") {
    val wl = tmpDir("advise_tbl")
    writeWorkload(wl, Seq(
      "SELECT count(*) FROM tbl WHERE l_quantity BETWEEN 24 AND 25 AND l_extendedprice BETWEEN 30000 AND 32000;",
      "SELECT count(*) FROM tbl WHERE l_quantity BETWEEN 10 AND 11 AND l_extendedprice BETWEEN 50000 AND 52000;"))
    val json = Advise.run(spark, "/root/testdata/sf0.001", wl, table = Some("lineitem"))
    graft.runner.Materialize.releaseAll()
    assert(json.contains("\"table\": \"lineitem\""), json)
    // same S1-width bands as above: hilbert since round 14
    assert(json.contains("\"family\": \"hilbert\""), json)
  }
}
