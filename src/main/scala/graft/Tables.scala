package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table access for the driver-provided parquet test tables
  * (TESTDATA.md). Mirrors the reference's table registration step
  * (reference: lakehouse_op/tpch_all_runner.py:143-165 registers each
  * materialized table as a temp view) but against plain parquet dirs.
  *
  * Scale note: `spark.read.parquet` on a directory of files scales to
  * arbitrarily many files; nothing here collects to the driver.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val extra: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ extra

  /** The events table's `ts` column has shipped as parquet
    * TIMESTAMP(NANOS) (read as LongType behind the legacy flag) and as
    * TIMESTAMP(MICROS) without UTC adjustment (read as TimestampNTZType).
    * Normalize both to session-TZ TimestampType (the session is pinned
    * UTC, so NTZ values carry over bit-identically) so `unix_micros` and
    * SQL date functions work regardless of the writer's physical type.
    */
  private def normalizeEvents(df: DataFrame): DataFrame = {
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // Exact integer division (`div`), not double `/`: at ~1.77e18 ns a
        // double ulp is ~256ns, so float division could shift a boundary
        // timestamp by 1µs and flip a date_trunc bucket.
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // The NTZ->LTZ cast interprets the wall clock in the SESSION
        // time zone; it is value-preserving only under the UTC pin
        // (Sessions.tuned sets it). Assert rather than silently shift
        // every event timestamp in an unpinned session (round-10
        // ADVICE).
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"normalizeEvents requires spark.sql.session.timeZone=UTC (got $tz): " +
            "the TimestampNTZ->Timestamp cast would shift every event ts")
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** Spread an under-split source across the session's parallelism.
    * The test parquet files are single-row-group, so every scan arrives
    * as ONE input split and anything per-row-expensive downstream
    * (md5/shingle/simhash kernels, join probes) runs on one task. At
    * production scale sources arrive pre-split into thousands of
    * row-groups and the guard makes this a no-op — it never reshuffles
    * an already-parallel 100 TB scan.
    */
  def parallelized(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val target = sc.defaultParallelism
    // Plan-free under-split test: `.rdd.getNumPartitions` forces AQE plan
    // materialization (two driver jobs per call — measured 40-800 ms).
    // The scan's split count is decidable from the files alone: many
    // files, or few files big enough that maxPartitionBytes splits them,
    // already scan parallel; only genuinely small single-split inputs
    // (the local testdata shape) pay a repartition.
    val files = df.inputFiles
    if (files.length >= target) df
    else {
      val conf = sc.hadoopConfiguration
      val bytes = files.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(conf).getFileStatus(p).getLen
      }.sum
      val maxSplit = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
      if (bytes / math.max(maxSplit, 1L) >= target) df
      else df.repartition(target)
    }
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEvents(spark.read.parquet(s"$sfDir/events.parquet"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  private val registered =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Register every table as a temp view (tpch_all_runner.py:143-165).
    * Idempotent per (session, sfDir): repeated calls with the same dir
    * skip the re-read; a different dir re-registers (views overwrite).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    val key = System.identityHashCode(spark).toString
    if (!registered.get(key).contains(sfDir)) {
      all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
      registered(key) = sfDir
    }
  }
}
