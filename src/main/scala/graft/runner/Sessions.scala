package graft.runner

import org.apache.spark.sql.SparkSession

/** The engine's shared session profile (M8; reference:
  * lakehouse_op/run_queries.py:46-62 and tpch_all_runner.py:105-121):
  * AQE with skew-join handling, 256m scan splits, vectorized parquet,
  * 50 MB broadcast threshold, UTC, nanos-as-long parquet timestamps.
  *
  * `canChangeCachedPlanOutputPartitioning` lets AQE right-size the
  * partitioning of persisted frames (Materialize.track) — without it a
  * cached plan keeps the static shuffle width and every downstream
  * stage pays per-task scheduling overhead regardless of data volume
  * (measured 2x on the dedup pipelines at sf0.1).
  */
object Sessions {

  /** Shuffle width derived from input volume (round-11 VERDICT "What's
    * wrong #1"): `max(cpus, dirBytes / 32 MB)`, capped at 4096. A fixed
    * partitions=cpus pin stops fitting once one shuffle outgrows memory
    * — at SF16 q63's 96M-row sort-merge partitions (~3M rows each at
    * 32) spill, and 64 partitions halves the wall with the identical
    * plan (BENCH_SF16_TPCH note). 32 MB of on-disk parquet per
    * partition ≈ 100-200 MB shuffled (decompressed, row-format), the
    * fits-in-memory band; AQE coalescing shrinks small stages back
    * down, so the rule only sets the CEILING a big shuffle may use.
    * Small corpora stay at cpus — a blanket high initialPartitionNum
    * was measured 2.7x WORSE on multi-stage queries at sf0.1
    * (q89 1.64 s -> 4.47 s) from per-stage scheduling overhead.
    * This is the rule a 100x deployment inherits: width follows data
    * volume, not a config constant.
    */
  def shufflePartitionsFor(dataDir: String, cpus: Int): Int =
    sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS").map(_.toInt).getOrElse {
      val bytes =
        try {
          val root = java.nio.file.Paths.get(dataDir)
          if (!java.nio.file.Files.exists(root)) 0L
          else {
            val s = java.nio.file.Files.walk(root)
            try s.filter(java.nio.file.Files.isRegularFile(_))
              .mapToLong(java.nio.file.Files.size(_)).sum()
            finally s.close()
          }
        } catch { case scala.util.control.NonFatal(_) => 0L }
      math.min(4096L, math.max(cpus.toLong, bytes / (32L * 1024 * 1024))).toInt
    }

  /** Session profile with data-volume-scaled shuffle width — the form
    * every data-dir-aware main (Bench, RunQueries, Scenario) uses.
    */
  def tuned(builder: SparkSession.Builder, cpus: String,
      dataDir: String): SparkSession.Builder =
    tuned(builder, cpus)
      .config("spark.sql.shuffle.partitions",
        shufflePartitionsFor(dataDir, cpus.toInt).toString)

  def tuned(builder: SparkSession.Builder, cpus: String): SparkSession.Builder =
    builder
      // full engine surface: curve/text SQL functions + optimizer rules
      // (FactBroadcastGuard) in every tuned session
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.files.maxPartitionBytes", (256L * 1024 * 1024).toString)
      .config("spark.sql.parquet.enableVectorizedReader", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // overridable for scale experiments (-1 disables broadcast joins
      // entirely — how the SF1 audits compare broadcast-build vs shuffle
      // plans without touching query text)
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BROADCAST_BYTES",
          (50L * 1024 * 1024).toString))
      .config("spark.ui.enabled", "false")
}
