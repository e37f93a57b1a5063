package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}

/** M2/M3 — the reference's two file-byte probes, used when a run needs
  * scan bytes but no listener/eventlog payload is at hand (reference:
  * run_queries.py:203-248; its metric merge prefers exact task metrics
  * and falls back through these, run_queries.py:650-700).
  *
  * - M2 [[inputFileBytes]] is an UPPER BOUND: every file of the plan's
  *   source RELATIONS (`inputFiles` lists the relation, so filters —
  *   including partition filters — above it do not shrink the listing;
  *   PySpark behaves identically), run_queries.py:203-222.
  * - M3 [[enumerateScannedFiles]] enumerates the files that actually
  *   produced output rows via `SELECT DISTINCT input_file_name()`
  *   (run_queries.py:225-248). After an aggregation/join boundary rows
  *   carry no file provenance and the probe returns (0, 0) — same
  *   semantics as the reference's "if the original query touched files
  *   at all" caveat.
  *
  * Scale note: both probes move only file PATHS — O(files of the scan),
  * the same list the driver already holds for listing. The M3 collect is
  * a DISTINCT over ≤ that many strings, never data rows.
  */
object ByteProbes {

  /** Sum of Hadoop file lengths, resolving the filesystem per path (a
    * plan can mix file: and hdfs: sources); unreadable paths are skipped
    * like the reference's per-file `except: pass`.
    */
  private def sumLens(spark: SparkSession, paths: Seq[String]): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    paths.iterator.map { f =>
      try {
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(conf).getFileStatus(p).getLen
      } catch { case scala.util.control.NonFatal(_) => 0L }
    }.sum
  }

  /** M2 (run_queries.py:203-222): byte upper bound via `df.inputFiles()`.
    * 0 when the source exposes no file paths (in-memory ranges, JDBC).
    */
  def inputFileBytes(df: DataFrame): Long = {
    val files =
      try df.inputFiles.toSeq
      catch { case scala.util.control.NonFatal(_) => Seq.empty[String] }
    if (files.isEmpty) 0L else sumLens(df.sparkSession, files)
  }

  /** M3 (run_queries.py:225-248): enumerate the files a query actually
    * read — `SELECT DISTINCT input_file_name() FROM (<sql>) q` — and sum
    * their sizes. Returns (nFiles, bytes); (0, 0) when the rows carry no
    * file provenance (post-aggregation) or the probe fails.
    */
  def enumerateScannedFiles(spark: SparkSession, sqlText: String): (Long, Long) =
    try {
      val probe = spark.sql(
        s"SELECT DISTINCT input_file_name() AS f FROM ( $sqlText ) q")
      collectFiles(probe)
    } catch { case scala.util.control.NonFatal(_) => (0L, 0L) }

  /** DataFrame variant of M3 for callers holding a frame, not SQL text. */
  def enumerateScannedFiles(df: DataFrame): (Long, Long) =
    try {
      collectFiles(df.select(
        org.apache.spark.sql.functions.input_file_name().as("f")).distinct())
    } catch { case scala.util.control.NonFatal(_) => (0L, 0L) }

  private def collectFiles(probe: DataFrame): (Long, Long) = {
    val files = probe.collect().iterator
      .map(_.getString(0)).filter(f => f != null && f.nonEmpty).toSeq
    if (files.isEmpty) (0L, 0L)
    else (files.length.toLong, sumLens(probe.sparkSession, files))
  }
}
