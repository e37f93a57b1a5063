package graft.layout

import org.scalatest.funsuite.AnyFunSuite

/** Guards the committed RQ3 scale-sweep artifact (results/rq3/,
  * produced by `runMain graft.cli.Rq3`): the layout benefit must
  * PERSIST across the three testdata scales — the experiment's whole
  * claim. Static CSV checks, no Spark session.
  */
class Rq3ArtifactSuite extends AnyFunSuite {

  private case class Row(sf: String, band: String, layout: String,
      speedup: Double, filesRatio: Double, kept: Long, total: Long)

  private lazy val rows: Seq[Row] = {
    val src = scala.io.Source.fromFile("results/rq3/rq3_geomean.csv")
    try src.getLines().drop(1).map { l =>
      val c = l.split(",")
      Row(c(0), c(1), c(2), c(3).toDouble, c(4).toDouble, c(5).toLong, c(6).toLong)
    }.toList
    finally src.close()
  }

  test("full matrix present: 3 scales x 4 bands x 4 layouts") {
    assert(rows.size == 48)
    assert(rows.map(_.sf).distinct.size == 3)
    assert(rows.map(_.band).distinct.sorted == Seq("S1", "S2", "S3", "S4"))
  }

  test("every curve layout prunes files vs baseline at every scale and band") {
    val curves = rows.filter(r => r.layout != "baseline")
    curves.foreach { r =>
      assert(r.filesRatio >= 1.0 && r.kept < r.total,
        s"${r.sf}/${r.band}/${r.layout}: no pruning (${r.kept}/${r.total})")
    }
  }

  test("selective bands prune hard at every scale (S1: >=4x fewer files)") {
    rows.filter(r => r.band == "S1" && r.layout != "baseline").foreach { r =>
      assert(r.filesRatio >= 4.0,
        s"${r.sf}/S1/${r.layout}: files ratio ${r.filesRatio} < 4x")
    }
  }

  test("wall-clock benefit does not shrink with scale (soft: warns, never fails)") {
    // The scale claim (bigger files per data volume => pruning pays
    // MORE) holds on the committed artifact, but wall-clock numbers
    // baked into a CSV are machine-dependent: regenerating results/rq3
    // on a loaded box can dip below any fixed threshold without a code
    // defect. The deterministic files-ratio gates above carry the hard
    // guarantee; this check only surfaces a warning for investigation.
    for (layout <- Seq("linear", "zorder", "hilbert")) {
      val small = rows.find(r => r.sf == "0.001" && r.band == "S1" && r.layout == layout).get
      val big = rows.find(r => r.sf == "0.1" && r.band == "S1" && r.layout == layout).get
      if (big.speedup < small.speedup * 0.8)
        info(s"WARN: $layout S1 wall speedup shrank with scale: " +
          s"${small.speedup} -> ${big.speedup} (files-ratio gates still hold)")
    }
  }
}
