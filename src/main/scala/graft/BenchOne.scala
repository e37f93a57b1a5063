package graft

import org.apache.spark.sql.SparkSession

/** Isolated single-query bench: one query per JVM, so a measurement can
  * never be polluted by a preceding query's GC pressure, JIT state, or
  * shuffle files (the q2_date_range-after-q29 pathology rounds 2–5
  * documented). Launch each query in a FRESH process:
  *
  * {{{
  * java -cp target/scala-2.13/classes:/opt/spark/jars/'*' \
  *   --add-opens=java.base/java.nio=ALL-UNNAMED ... \
  *   graft.BenchOne q2_date_range [reps]
  * }}}
  *
  * (tools/bench_isolated.py drives this for a list of queries.)
  * Protocol: one discarded warmup, then `reps` (default 3) measured
  * runs; the headline is the MEDIAN (not min — an isolated JVM has no
  * cross-query pollution to forgive, and median resists one-off GC).
  * Prints one JSON line: {"query":..,"median":..,"runs":[..],"sf":..}.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // the data-dir-aware profile, SAME as the sweep's (round-14,
    // VERDICT "Next #7": isolated runs with the byte-derived width):
    // the byte-derived shuffle width keeps partitions inside the 32 MB
    // memory band at sf16/sf32 — at the sf0.1 dev scale it resolves to
    // the cpu count, so small-scale numbers stay comparable
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus, sfDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    def once(): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      finally graft.runner.Materialize.releaseAllFast(spark)
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup (discarded)
    val runs = Seq.fill(reps)(once())
    val sorted = runs.sorted
    // true median for either parity (even reps average the two middles)
    val median =
      if (reps % 2 == 1) sorted(reps / 2)
      else (sorted(reps / 2 - 1) + sorted(reps / 2)) / 2.0
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"query":"$name","median":${f3(median)},"runs":[${runs.map(f3).mkString(",")}],"sf":"$sfDir"}""")
    spark.stop()
  }
}
