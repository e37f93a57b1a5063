package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: execute one SparkEntry query and dump its FINAL adaptive
  * plan (AQE re-plans at runtime, so an unexecuted explain() shows the
  * initial plan only — round-2 gotcha). Used for the SF1 scale audits:
  *
  * {{{
  * runMain graft.tools.PlanDump q63_tpch21 /tmp/sf1
  * }}}
  *
  * Executes via queryExecution.toRdd.count() so the inspected plan is the
  * one that ran (df.count() would build a derived QueryExecution and
  * leave this plan's runtime state untouched).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val t0 = System.nanoTime()
    df.queryExecution.toRdd.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"== $name @ $sfDir — $sec%.3f s ==")
    println(df.queryExecution.executedPlan.toString)
    // optional args(2): ALSO write the post-execution formatted explain
    // (the AQE final plan) to a file — the optimization rounds' committed
    // plan evidence (plans/r19/<query>_{before,after}.txt)
    if (args.length > 2) {
      val fmt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val p = java.nio.file.Paths.get(args(2))
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p,
        f"== $name @ $sfDir — $sec%.3f s ==%n" + fmt + "\n")
    }
    graft.runner.Materialize.releaseAll()
    spark.stop()
  }
}
