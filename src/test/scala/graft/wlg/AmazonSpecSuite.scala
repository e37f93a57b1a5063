package graft.wlg

import graft.SparkTestBase
import graft.profile.Profiler
import java.nio.file.{Files, Paths}

/** The Amazon-reviews workload family (reference:
  * workload_spec/spec_amazon_Q1.yaml … Q12), adapted to the events
  * table in workload_spec/spec_events_Q*.yaml: TIMESTAMP interval
  * rules, DATE_TRUNC/DATE grouping, OR-of-ranges, HAVING BETWEEN,
  * conditional-SUM ratios, IN-lists of chained int params. This is the
  * end-to-end evidence for the TIMESTAMP param path: YamlSpec parse →
  * profile → fill → execute / RunQueries CLI.
  */
class AmazonSpecSuite extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"
  private def readSpec(i: Int): Seq[WorkloadGen.TemplateSpec] =
    YamlSpec.parseSpec(new String(
      Files.readAllBytes(Paths.get(s"workload_spec/spec_events_Q$i.yaml")), "UTF-8"))

  test("all 12 event specs parse, fill, and execute green") {
    val events = graft.Tables.load(spark, sfDir, "events")
    val stats = Profiler.profile(events)
    events.createOrReplaceTempView("events_wlg")
    val residualParam = ":[a-z_]+".r
    (1 to 12).foreach { i =>
      readSpec(i).foreach { spec0 =>
        val spec = spec0.copy(n = 3) // spec files carry the reference's n=10
        val instances = WorkloadGen.fill(spec, stats, "events_wlg")
        assert(instances.length == 3, s"Q$i filled ${instances.length}")
        instances.foreach { inst =>
          // every :param substituted (strip quoted literals first — the
          // rendered TIMESTAMP strings legitimately contain colons)
          val bare = inst.sql.replaceAll("'[^']*'", "''")
          assert(residualParam.findFirstIn(bare).isEmpty,
            s"unsubstituted param in Q$i: ${inst.sql}")
          val rows = spark.sql(inst.sql).collect()
          assert(rows != null, s"Q$i returned null")
        }
      }
    }
  }

  test("TIMESTAMP interval rule: bounds are in-domain timestamps, lo <= hi") {
    val events = graft.Tables.load(spark, sfDir, "events")
    val stats = Profiler.profile(events.select("ts", "value", "user_id"))
    val spec = readSpec(1).head.copy(n = 6)
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    WorkloadGen.fill(spec, stats, "t").foreach { q =>
      val lo = java.time.LocalDateTime.parse(q.params("ts_lo"), fmt)
      val hi = java.time.LocalDateTime.parse(q.params("ts_hi"), fmt)
      assert(!hi.isBefore(lo), s"ts window inverted: $lo..$hi")
      // events span 2024-01-01 .. 2024-01-30 (TESTDATA.md)
      assert(lo.getYear == 2024 && lo.getMonthValue == 1, s"out of domain: $lo")
      assert(hi.getYear == 2024 && hi.getMonthValue == 1, s"out of domain: $hi")
    }
  }

  test("spec YAML with timestamp/int rules round-trips through toYaml") {
    // one document per generation block, like the reference's per-spec files
    (1 to 12).foreach { i =>
      val specs = readSpec(i)
      assert(YamlSpec.parseSpec(YamlSpec.toYaml(specs)) == specs, s"Q$i")
    }
  }

  test("Q1 family runs through emit -> RunQueries CLI on the events view") {
    val events = graft.Tables.load(spark, sfDir, "events")
    val stats = Profiler.profile(events)
    events.createOrReplaceTempView("events_cli")
    val spec = readSpec(1).head.copy(n = 2)
    val insts = WorkloadGen.fill(spec, stats, "{{tbl}}")
    val outDir = tmpDir("wlg_events_q1")
    WorkloadGen.emit(outDir, insts)
    val rs = graft.cli.RunQueries.runDir(spark,
      graft.cli.RunQueries.Config(table = sfDir, queriesDir = outDir), "events_cli")
    assert(rs.length == 2)
    assert(rs.forall(_.metrics.wallSec > 0))
  }
}
