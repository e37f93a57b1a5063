ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lakehouse_sfcspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked run's stdout through verbatim (no "[info] " prefix):
// the driver json-parses Bench's single output line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // A ~100-query sweep generates thousands of whole-stage-codegen
  // classes in one JVM; the JDK default 240 MB code cache fills, the
  // JIT flushes/stops compiling, and late queries run partially
  // interpreted — observed as scheduler-delay/deserialize-dominated
  // slow runs (BENCH_RUNS sched_ms/deser_ms) with flat GC and spill.
  "-XX:ReservedCodeCacheSize=512m",
  // Throughput GC for the single-JVM batch bench: at SF16 the 96M-row
  // sort/window queries are GC-bound under G1 (q63: 35-85 s summed task
  // GC inside a ~15 s wall, zero spill); ParallelGC cuts that to ~5 s
  // and roughly halves the wall. Batch executors optimize throughput,
  // not pause latency — the same choice a cluster deployment makes in
  // spark.executor.extraJavaOptions.
  "-XX:+UseParallelGC",
  // Off-heap execution memory (round-13 knob matrix, BENCH_RUNS_DEV):
  // SF16 q63's sort-merge state churn is GC-bound on-heap; moving
  // execution memory off-heap cut it 11.1 -> 6.2 s (4 tight reps,
  // isolated JVMs) and was neutral for every other probe. On a cluster
  // this is spark.executor.memoryOverhead + the same two confs.
  "-Dspark.memory.offHeap.enabled=true",
  "-Dspark.memory.offHeap.size=4g",
) ++ sys.env.get("SPARK_GRAFT_JVM_FLAGS").toSeq.flatMap(_.split("\\s+"))
