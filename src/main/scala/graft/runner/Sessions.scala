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
