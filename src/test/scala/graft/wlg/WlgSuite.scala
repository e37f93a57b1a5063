package graft.wlg

import graft.profile.UniDist
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class WlgSuite extends AnyFunSuite {

  private val uniform = UniDist(Seq(0.0, 100.0), Seq(1000L))

  test("sampleBetween hits the target selectivity on a uniform dist") {
    val rnd = new Random(42)
    for (sel <- Seq(0.001, 0.01, 0.1, 0.2); _ <- 1 to 50) {
      val (lo, hi) = Samplers.sampleBetween(uniform, sel, rnd)
      val got = (hi - lo) / 100.0
      assert(math.abs(got - sel) < 1e-9, s"sel=$sel got=$got")
      assert(lo >= 0.0 && hi <= 100.0)
    }
  }

  test("sampleEqFromTopk is frequency-weighted") {
    val rnd = new Random(1)
    val topk = Seq("a" -> 900L, "b" -> 100L)
    val draws = (1 to 2000).map(_ => Samplers.sampleEqFromTopk(topk, rnd))
    val aShare = draws.count(_ == "a") / 2000.0
    assert(aShare > 0.85 && aShare < 0.95, s"a share $aShare")
  }

  test("phi matches known normal CDF values") {
    assert(math.abs(Samplers.phi(0.0) - 0.5) < 1e-7)
    assert(math.abs(Samplers.phi(1.96) - 0.975) < 1e-3)
    assert(math.abs(Samplers.phi(-1.96) - 0.025) < 1e-3)
  }

  test("copula spans multiply to the target selectivity") {
    val rnd = new Random(7)
    val dists = Seq(uniform, uniform, uniform)
    for (_ <- 1 to 30) {
      val ranges = Samplers.sampleCopula(dists, 0.008, 0.4, rnd)
      val vol = ranges.map { case (lo, hi) => (hi - lo) / 100.0 }.product
      assert(math.abs(vol - 0.008) < 1e-6, s"volume $vol")
    }
  }

  test("cholesky of equicorrelation reproduces the matrix") {
    val l = Samplers.choleskyEquicorr(3, 0.4)
    for (i <- 0 until 3; j <- 0 until 3) {
      val got = (0 until 3).map(k => l(i)(k) * l(j)(k)).sum
      val want = if (i == j) 1.0 else 0.4
      assert(math.abs(got - want) < 1e-9, s"($i,$j): $got")
    }
  }

  test("grid covers the unit cube evenly; lhs stratifies each dim") {
    val g = Samplers.gridPoints(2, 9)
    assert(g.length == 9)
    assert(g.flatten.forall(v => v > 0 && v < 1))
    assert(g.distinct.length == 9)

    val rnd = new Random(5)
    val l = Samplers.lhsPoints(2, 10, rnd)
    assert(l.length == 10)
    for (d <- 0 until 2) {
      val strata = l.map(p => (p(d) * 10).toInt).sorted
      assert(strata == (0 until 10).toList, s"dim $d strata $strata")
    }
  }

  test("constraint evaluator covers the reference grammar") {
    import ConstraintEval._
    val p = Map("hi" -> Num(10), "lo" -> Num(3), "x" -> Str("b"), "y" -> Num(5))
    assert(evaluate("hi >= lo", p))
    assert(!evaluate("lo > hi", p))
    assert(evaluate("x not in {a, c}", p))
    assert(!evaluate("x not in {a, b}", p))
    assert(evaluate("x in {a, b}", p))
    assert(evaluate("hi >= lo and y > 4", p))
    assert(!evaluate("hi >= lo and y > 5", p))
    assert(evaluate("hi < lo or y == 5", p))
    assert(evaluate("not (hi < lo)", p))
    assert(evaluate("'b' == x", p))
    assert(evaluate("y != 6", p))
  }

  test("render substitutes longest param names first and {{tbl}}") {
    val sql = WorkloadGen.render(
      "SELECT * FROM {{tbl}} WHERE a BETWEEN :p AND :p_hi",
      Map("tbl" -> "lineitem", "p" -> "1", "p_hi" -> "9"))
    assert(sql == "SELECT * FROM lineitem WHERE a BETWEEN 1 AND 9")
  }

  test("fill is deterministic under a seed and respects constraints") {
    val stats = graft.profile.Profiler.TableStats(
      rows = 1000,
      columns = Seq(graft.profile.Profiler.ColumnStats(
        "v", "numeric", 1000, 0, Some(0.0), Some(100.0),
        Map("0.5" -> 50.0), 100, Nil,
        Some((Seq(0.0, 50.0, 100.0), Seq(500L, 500L))))),
      correlations = Nil)
    val spec = WorkloadGen.TemplateSpec(
      name = "t1",
      sql = "SELECT count(*) FROM {{tbl}} WHERE v BETWEEN :r_lo AND :r_hi",
      params = Seq(WorkloadGen.RangeParam("r", "v", 0.1)),
      constraints = Seq("r_hi >= r_lo"),
      n = 5)
    val a = WorkloadGen.fill(spec, stats, "t")
    val b = WorkloadGen.fill(spec, stats, "t")
    assert(a == b, "same seed must give identical workloads")
    assert(a.length == 5)
    assert(a.forall(_.sql.contains("FROM t WHERE")))
    assert(a.forall(q => !q.sql.contains(":r_lo")))
  }

  test("date-lag interval anchors to another param window and clips to domain") {
    val stats = graft.profile.Profiler.TableStats(
      rows = 1000,
      columns = Seq(graft.profile.Profiler.ColumnStats(
        "d", "datetime", 1000, 0,
        Some(0.0), Some(365.0 * 86400.0), // one year of epoch-seconds
        Map.empty, 365, Nil,
        Some((Seq(0.0, 365.0 * 86400.0), Seq(1000L))))),
      correlations = Nil)
    val spec = WorkloadGen.TemplateSpec(
      name = "lag",
      sql = "SELECT 1 FROM {{tbl}} WHERE d BETWEEN :a_lo AND :a_hi AND e BETWEEN :b_lo AND :b_hi",
      params = Seq(
        WorkloadGen.RangeParam("a", "d", 0.05),
        WorkloadGen.DateLagParam("b", "d", anchor = "a",
          lagDays = 30, widthDays = 14, maxStartGapDays = 5)),
      n = 20)
    val qs = WorkloadGen.fill(spec, stats, "t")
    assert(qs.length == 20)
    qs.foreach { q =>
      val aLo = q.params("a_lo").toDouble
      val bLo = q.params("b_lo").toDouble
      val bHi = q.params("b_hi").toDouble
      val lag = (bLo - aLo) / 86400.0
      assert(lag >= 30.0 - 1e-9 && lag <= 35.0 + 1e-9 || bLo == 365.0 * 86400.0,
        s"lag $lag outside [30,35]")
      assert(bHi >= bLo && bHi <= 365.0 * 86400.0 + 1e-6)
      assert(bHi - bLo <= 14.0 * 86400.0 + 1e-6)
    }
  }

  test("copulaPoints: rho controls correlation of the planned positions") {
    def corr(ps: Seq[Seq[Double]]): Double = {
      val x = ps.map(_(0)); val y = ps.map(_(1))
      val n = ps.length
      val mx = x.sum / n; val my = y.sum / n
      val cov = x.zip(y).map { case (a, b) => (a - mx) * (b - my) }.sum
      val sx = math.sqrt(x.map(a => (a - mx) * (a - mx)).sum)
      val sy = math.sqrt(y.map(b => (b - my) * (b - my)).sum)
      cov / (sx * sy)
    }
    val hi = corr(Samplers.copulaPoints(2, 500, 0.9, new Random(11)))
    val lo = corr(Samplers.copulaPoints(2, 500, 0.0, new Random(11)))
    assert(hi > 0.7, s"rho=0.9 sample corr $hi")
    assert(math.abs(lo) < 0.15, s"rho=0 sample corr $lo")
    assert(Samplers.copulaPoints(3, 50, 0.5, new Random(1))
      .forall(_.forall(u => u >= 0 && u <= 1)))
  }

  test("fill mode=copula generates correlated 2-D range windows") {
    val stats = graft.profile.Profiler.TableStats(
      rows = 1000,
      columns = Seq("x", "y").map(c => graft.profile.Profiler.ColumnStats(
        c, "numeric", 1000, 0, Some(0.0), Some(100.0),
        Map("0.5" -> 50.0), 100, Nil,
        Some((Seq(0.0, 50.0, 100.0), Seq(500L, 500L))))),
      correlations = Nil)
    val spec = WorkloadGen.TemplateSpec(
      name = "cop",
      sql = "SELECT count(*) FROM {{tbl}} WHERE x BETWEEN :a_lo AND :a_hi" +
        " AND y BETWEEN :b_lo AND :b_hi",
      params = Seq(
        WorkloadGen.RangeParam("a", "x", 0.1),
        WorkloadGen.RangeParam("b", "y", 0.2)),
      n = 200, mode = "copula", rho = 0.9)
    val qs = WorkloadGen.fill(spec, stats, "t")
    assert(qs.length == 200)
    // each param keeps its own marginal selectivity...
    qs.foreach { q =>
      assert(math.abs((q.params("a_hi").toDouble - q.params("a_lo").toDouble) / 100.0 - 0.1) < 1e-6)
      assert(math.abs((q.params("b_hi").toDouble - q.params("b_lo").toDouble) / 100.0 - 0.2) < 1e-6)
    }
    // ...and the window POSITIONS are correlated across params
    val x = qs.map(_.params("a_lo").toDouble)
    val y = qs.map(_.params("b_lo").toDouble)
    val mx = x.sum / x.length; val my = y.sum / y.length
    val r = x.zip(y).map { case (a, b) => (a - mx) * (b - my) }.sum /
      (math.sqrt(x.map(a => (a - mx) * (a - mx)).sum) *
        math.sqrt(y.map(b => (b - my) * (b - my)).sum))
    assert(r > 0.7, s"window-position correlation $r under rho=0.9")
    // determinism under the seed
    assert(WorkloadGen.fill(spec, stats, "t") == qs)
  }

  test("YAML spec round-trip: parseSpec(toYaml(specs)) == specs") {
    val specs = Seq(WorkloadGen.TemplateSpec(
      name = "q1",
      sql = "SELECT count(*) FROM {{tbl}}\nWHERE v BETWEEN :r_lo AND :r_hi\n" +
        "  AND d BETWEEN :w_lo AND :w_hi AND k = :e AND c IN (:cw)",
      params = Seq(
        WorkloadGen.RangeParam("r", "v", 0.05),
        WorkloadGen.IntervalParam("i", "v", 0.1, intAlign = true),
        WorkloadGen.EqParam("e", "k"),
        WorkloadGen.DateLagParam("w", "d", "r", 2, 30, 14),
        WorkloadGen.CatWindowParam("cw", "c", 3)),
      constraints = Seq("r_hi >= r_lo", "w_lo >= r_lo"),
      n = 7, mode = "copula", seed = 99L, rho = 0.6))
    val yaml = YamlSpec.toYaml(specs)
    val back = YamlSpec.parseSpec(yaml)
    assert(back == specs, s"round-trip mismatch:\n$yaml")
    // and a second emit is a fixpoint
    assert(YamlSpec.toYaml(back) == yaml)
  }

  test("YAML parser handles the reference spec shape (comments, flow, blocks)") {
    val doc =
      """# spec in the reference's shape (workload_spec/spec_tpch_Q1.yaml)
        |generation: {n: 10, mode: random, seed: 42}
        |
        |templates:
        |  - id: DATES_A
        |    sql: |
        |      SELECT l_orderkey FROM {{tbl}}
        |      WHERE l_shipdate BETWEEN DATE ':sd_lo' AND DATE ':sd_hi'
        |    params:
        |      sd_lo: {type: date}                               # comment; with semicolon
        |      sd_hi: {type: date, constraint: "sd_hi >= sd_lo"}
        |    interval_rules:
        |      - {column: l_shipdate, lo: sd_lo, hi: sd_hi, type: date, ratio_range: [0.05, 0.12]}
        |      - column: l_receiptdate
        |        lo: rd_lo
        |        hi: rd_hi
        |        align_with: {lo: sd_lo, hi: sd_hi}
        |        lag_days: [2, 30]
        |        clip_to_domain: true
        |""".stripMargin
    val y = YamlSpec.parse(doc).asMap
    assert(y("generation").asMap("n").str == "10")
    val t = y("templates").asSeq.head.asMap
    assert(t("id").str == "DATES_A")
    assert(t("sql").str.contains("BETWEEN DATE ':sd_lo'"))
    assert(t("params").asMap("sd_hi").asMap("constraint").str == "sd_hi >= sd_lo")
    val rules = t("interval_rules").asSeq
    assert(rules.length == 2)
    assert(rules(0).asMap("ratio_range").asSeq.map(_.str) == Seq("0.05", "0.12"))
    assert(rules(1).asMap("align_with").asMap("lo").str == "sd_lo")
    assert(rules(1).asMap("lag_days").asSeq.map(_.str) == Seq("2", "30"))
    assert(rules(1).asMap("clip_to_domain").str == "true")
  }

  test("workload YAML write/read round-trip (yaml_emit equivalent)") {
    val dir = java.nio.file.Files.createTempDirectory("wlg_yaml").toString
    val instances = Seq(
      WorkloadGen.QueryInstance("t1",
        "SELECT count(*) FROM lineitem\nWHERE v BETWEEN 3 AND 9",
        Map("r_lo" -> "3", "r_hi" -> "9")),
      WorkloadGen.QueryInstance("t2", "SELECT 'it''s' AS s", Map.empty))
    val p = s"$dir/workload.yaml"
    YamlSpec.writeWorkloadYaml(p, instances)
    assert(YamlSpec.readWorkloadYaml(p) == instances)
  }

  test("GraftExtensions applies cleanly to a fresh extension set") {
    new graft.GraftExtensions().apply(
      new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("GraftExtensions registers curve + text SQL functions in a new session") {
    import org.apache.spark.sql.SparkSession
    val old = graft.SparkTestBase.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql(
        "SELECT graft_simhash60(array('a','b')) AS h, " +
          "graft_shingles(array('a','b','c'), 2) AS sh, " +
          "graft_zvalue(4, CAST(3 AS BIGINT), CAST(1 AS BIGINT)) AS z")
        .collect()(0)
      val expected = {
        import org.apache.spark.unsafe.types.UTF8String
        graft.text.TextKernels.simhash60(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            Array[Any](UTF8String.fromString("a"), UTF8String.fromString("b"))))
      }
      assert(r.getLong(0) == expected)
      assert(r.getSeq[String](1) == Seq("a b", "b c"))
      assert(r.getLong(2) == graft.curve.Curves.zValue(Array(3L, 1L), 4))
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("emit writes numbered sql files and a workload doc") {
    val dir = java.nio.file.Files.createTempDirectory("wlg_emit").toString
    WorkloadGen.emit(dir, Seq(
      WorkloadGen.QueryInstance("t", "SELECT 1", Map("a" -> "1"))))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "query_0000.sql")))
    val doc = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "workload.json")))
    assert(doc.contains("\"tpl\": \"t\""))
  }
}
