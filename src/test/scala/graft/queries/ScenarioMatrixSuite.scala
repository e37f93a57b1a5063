package graft.queries

import graft.SparkTestBase
import graft.cli.Scenario

/** The RQ1 layout-effectiveness matrix, asserted on its deterministic
  * dimension (files scanned — wall times at test scale are noise). The
  * invariants mirror the reference's headline finding (BASELINE.md):
  * layouts prune, space-filling curves beat or match 1-D sort on 2-D
  * low-selectivity ranges, and hilbert's continuity gives it the
  * tightest file bounding boxes (no z-jump overlap).
  */
class ScenarioMatrixSuite extends SparkTestBase {

  test("RQ1 mini-matrix: pruning ordering holds on low-selectivity 2-D ranges") {
    val cells = Scenario.runMatrix(spark, "/root/testdata/sf0.001",
      nPerBand = 4, numFiles = 16, bands = Seq("S1" -> 0.0005, "S2" -> 0.005))
    val geo = Scenario.geomeans(cells)
    def ratio(band: String, layout: String): Double =
      geo.find(g => g.band == band && g.layout == layout).get.gmFilesRatio

    for (band <- Seq("S1", "S2")) {
      val (lin, zo, hi) =
        (ratio(band, "linear"), ratio(band, "zorder"), ratio(band, "hilbert"))
      // every layout prunes vs baseline
      assert(lin > 1.0, s"$band linear=$lin")
      assert(zo > 1.0, s"$band zorder=$zo")
      assert(hi > 1.0, s"$band hilbert=$hi")
      // the best space-filling curve beats or matches the 1-D sort
      assert(math.max(zo, hi) >= lin, s"$band sfc=${math.max(zo, hi)} linear=$lin")
      // hilbert (continuous curve, tight bboxes) >= zorder (z-jumps)
      assert(hi >= zo, s"$band hilbert=$hi zorder=$zo")
    }
    // every cell returns the same row count across layouts (layout is
    // physical only — never changes results)
    cells.groupBy(c => (c.band, c.query)).foreach { case (k, cs) =>
      assert(cs.map(_.rows).distinct.size == 1, s"rows diverge at $k: $cs")
    }
  }

  test("per-arm schedule yields the same cells as interleaved") {
    // --per-arm builds/measures/deletes one variant at a time (peak
    // disk = one variant — how the sf64 rung fits the sandbox); the
    // cells must be IDENTICAL to the interleaved schedule on every
    // deterministic dimension (rows, files, manifest bytes)
    val bands = Seq("S1" -> 0.0005)
    def key(cs: Seq[Scenario.Cell]) = cs.map(c =>
      (c.band, c.query, c.layout, c.rows, c.filesKept, c.filesTotal,
        c.fileBytesKept, c.fileBytesTotal)).toSet
    val inter = Scenario.runMatrix(spark, "/root/testdata/sf0.001",
      nPerBand = 2, numFiles = 8, bands = bands)
    val seq = Scenario.runMatrix(spark, "/root/testdata/sf0.001",
      nPerBand = 2, numFiles = 8, bands = bands, perArm = true)
    assert(key(inter) == key(seq),
      s"schedules diverge:\n${key(inter) -- key(seq)}\n${key(seq) -- key(inter)}")
  }

  test("RQ2 mini-matrix: N=3 layout ordering — curves prune, hilbert leads") {
    val cells = Scenario.runMatrix(spark, "/root/testdata/sf0.001",
      nPerBand = 4, numFiles = 16, bands = Seq("S1" -> 0.0005, "S2" -> 0.005),
      cols = graft.cli.Rq2.ColSets.head._2)
    val geo = Scenario.geomeans(cells)
    def ratio(band: String, layout: String): Double =
      geo.find(g => g.band == band && g.layout == layout).get.gmFilesRatio

    for (band <- Seq("S1", "S2")) {
      // every ordered layout prunes the 3-D range workload vs baseline
      for (l <- Seq("linear", "zorder", "hilbert"))
        assert(ratio(band, l) > 1.0, s"$band $l=${ratio(band, l)}")
      // the continuous curve keeps its lead over z-jumps in 3-D
      assert(ratio(band, "hilbert") >= ratio(band, "zorder"),
        s"$band hilbert=${ratio(band, "hilbert")} zorder=${ratio(band, "zorder")}")
    }
    cells.groupBy(c => (c.band, c.query)).foreach { case (k, cs) =>
      assert(cs.map(_.rows).distinct.size == 1, s"rows diverge at $k: $cs")
    }
  }

  test("per-family geomeans separate lead-column wins from families a " +
      "sort cannot help (r16 VERDICT #3)") {
    import graft.cli.Scenario
    import graft.cli.Scenario.Cell
    assert(Scenario.familyOf("asin_f4_3") == "asin_f4")
    assert(Scenario.familyOf("ts_rating_S3_11") == "ts_rating_S3")
    assert(Scenario.familyOf("deep_asin_f4_0") == "deep_asin_f4")
    // synthetic cells: the lead family prunes 10x under linear, the
    // second-column family not at all — the OVERALL geomean dilutes to
    // ~3.2x while family rows keep both stories
    def cell(q: String, layout: String, kept: Long) =
      Cell("C1", q, layout, rows = 1, wallSec = 1.0,
        filesKept = kept, filesTotal = 20, bytesScanned = 0)
    val cells = Seq(
      cell("lead_f1_0", "baseline", 20), cell("lead_f1_1", "baseline", 20),
      cell("second_f1_0", "baseline", 20), cell("second_f1_1", "baseline", 20),
      cell("lead_f1_0", "linear", 2), cell("lead_f1_1", "linear", 2),
      cell("second_f1_0", "linear", 20), cell("second_f1_1", "linear", 20))
    val fam = Scenario.geomeansByFamily(cells)
    val lead = fam.find(f => f.family == "lead_f1" && f.layout == "linear").get
    val second = fam.find(f => f.family == "second_f1" && f.layout == "linear").get
    assert(math.abs(lead.gmFilesRatio - 10.0) < 1e-9 && lead.nQueries == 2)
    assert(math.abs(second.gmFilesRatio - 1.0) < 1e-9)
    val overall = Scenario.geomeans(cells)
      .find(g => g.band == "C1" && g.layout == "linear").get
    assert(overall.gmFilesRatio < lead.gmFilesRatio &&
      overall.gmFilesRatio > second.gmFilesRatio)
  }
}
