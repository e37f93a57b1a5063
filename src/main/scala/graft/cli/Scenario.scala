package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.layout._
import graft.layout.LayoutWriter.LayoutSpec
import graft.profile.Profiler
import graft.runner.{MetricsListener, QueryRunner}
import graft.wlg.WorkloadGen
import graft.wlg.WorkloadGen.{RangeParam, TemplateSpec}

/** End-to-end scenario main — the reference's RQ1 experiment matrix in
  * miniature (scripts/run_RQ_1_matrix.sh): profile the table → generate
  * a selectivity-controlled range workload → materialize four layouts →
  * run every query against every layout through the pruned scan →
  * report files/bytes/latency per layout.
  *
  * Usage: runMain graft.cli.Scenario [sfDir] [outCsv]
  */
object Scenario {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outCsv = args.lift(1).getOrElse("/tmp/graft_scenario_results.csv")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)

    // 1. profile (F1–F6)
    val li = Tables.load(spark, sfDir, "lineitem")
    val stats = Profiler.profile(li.select("l_quantity", "l_extendedprice"))
    println(s"[scenario] profiled lineitem: rows=${stats.rows}")

    // 2. generate a 2-D range workload at ~1% selectivity (band S2/S3)
    val spec = TemplateSpec(
      name = "rq1_2d",
      sql = """SELECT count(*) AS cnt FROM {{tbl}}
              |WHERE l_quantity BETWEEN :q_lo AND :q_hi
              |  AND l_extendedprice BETWEEN :p_lo AND :p_hi""".stripMargin,
      params = Seq(
        RangeParam("q", "l_quantity", 0.1),
        RangeParam("p", "l_extendedprice", 0.1)),
      constraints = Seq("q_hi >= q_lo and p_hi >= p_lo"),
      n = 8)
    val workload = WorkloadGen.fill(spec, stats, "{{tbl}}")
    println(s"[scenario] generated ${workload.length} query instances")

    // 3. four layouts on the two predicate columns
    val layouts = Seq("baseline", "linear", "zorder", "hilbert").map { l =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft_sc_$l").toString
      LayoutWriter.write(li, dir,
        LayoutSpec(l, Seq("l_quantity", "l_extendedprice"), numFiles = Some(16)))
      l -> dir
    }

    // 4. run the workload per layout through the pruned scan
    val results = for {
      (layout, dir) <- layouts
      (inst, qi) <- workload.zipWithIndex
    } yield {
      val preds = Seq(
        NumBetween("l_quantity",
          inst.params("q_lo").toDouble, inst.params("q_hi").toDouble),
        NumBetween("l_extendedprice",
          inst.params("p_lo").toDouble, inst.params("p_hi").toDouble))
      val scan = PrunedScan.read(spark, dir, preds)
      scan.df.createOrReplaceTempView("pruned_tbl")
      val sql = inst.sql.replace("{{tbl}}", "pruned_tbl")
      val m = QueryRunner.run(spark, spark.sql(sql), s"$layout-q$qi",
        listener = Some(listener), warmup = true)
      m.copy(name = s"$layout;q$qi;kept=${scan.filesKept}/${scan.filesTotal}")
    }
    QueryRunner.writeCsv(outCsv, results)

    // 5. per-layout summary
    println(f"${"layout"}%-10s ${"files"}%8s ${"bytesMB"}%10s ${"wallSec"}%8s")
    Seq("baseline", "linear", "zorder", "hilbert").foreach { l =>
      val rs = results.filter(_.name.startsWith(l + ";"))
      val files = rs.map(_.filesScanned).sum
      val mb = rs.map(_.bytesScanned).sum / 1e6
      val wall = rs.map(_.wallSec).sum
      println(f"$l%-10s $files%8d $mb%10.2f $wall%8.3f")
    }
    println(s"[scenario] results written to $outCsv")
    spark.stop()
  }
}
