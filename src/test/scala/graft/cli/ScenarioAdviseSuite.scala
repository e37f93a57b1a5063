package graft.cli

import graft.SparkTestBase

/** Scenario --advise (round-19, VERDICT Next #7): the advisor's
  * recommendation is materialized as an extra matrix arm and measured.
  * On an S1-tight two-column range workload the advice must be a
  * sorted layout on the workload columns, and the advised arm must
  * out-prune baseline like the fixed curve arms do.
  */
class ScenarioAdviseSuite extends SparkTestBase {

  test("advised arm materializes, prunes like the recommended fixed arm") {
    val out = tmpDir("graft_advise_art")
    val cells = Scenario.runMatrix(spark, "/root/testdata/sf0.001",
      nPerBand = 2, numFiles = 4,
      bands = Seq("S1" -> 0.0005),
      advise = true, adviceOut = Some(s"$out/advice.json"))
    val arms = cells.map(_.layout).distinct
    val advised = arms.find(_.startsWith("advised("))
    assert(advised.isDefined, s"no advised arm in $arms")
    // S1-tight 2-col ranges: the advice must be a sorted family
    assert(advised.get != "advised(baseline)", advised.get)
    val geo = Scenario.geomeans(cells)
    val advGeo = geo.find(_.layout == advised.get).get
    val baseGeo = geo.find(_.layout == "baseline").get
    assert(advGeo.filesKept < baseGeo.filesKept,
      s"advised arm must out-prune baseline: $advGeo vs $baseGeo")
    assert(advGeo.gmFilesRatio > 1.0, advGeo.toString)
    // the advised arm matches its fixed twin's pruning (same spec,
    // deterministic layout) within range-sampling noise
    val family = advised.get.stripPrefix("advised(").stripSuffix(")")
    val twin = geo.find(_.layout == family).get
    assert(advGeo.gmFilesRatio >= 0.8 * twin.gmFilesRatio,
      s"advised arm prunes far worse than its fixed twin: $advGeo vs $twin")
    // artifact written
    val advice = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "advice.json"))
    assert(advice.contains("\"family\"") && advice.contains(family), advice)
  }
}
