package graft.layout

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file record-key bloom index — the Hudi bloom-index analog
  * (hudi record-level index / bloom filters in parquet footers) for
  * tables whose LAYOUT is orthogonal to their record key. Zone maps
  * cannot scope a keyed rewrite there: every file's key zone spans the
  * whole domain (measured: a 10-key upsert rewrote all 37 files of the
  * rq7 zorder table, tools/UpsertProbe), so [[graft.table.Upserter]]
  * consults this sidecar to shrink the affected set to files that MAY
  * contain a batch key.
  *
  * Layout: `<table>/_graft_keyindex/` — a parquet dir of
  * `(path: String, rows: Long, bloom: Array[Byte])`, one row per data
  * file, blooms being `org.apache.spark.util.sketch.BloomFilter`
  * serializations over the file's key column.
  *
  * Soundness: blooms have false POSITIVES only, so a lookup can only
  * ADD files to the affected set, never hide one — and files missing
  * from the sidecar are treated as affected (fail-safe), so a crash
  * between a table mutation and the index update degrades pruning,
  * never correctness. Mutators keep it consistent by removing
  * superseded paths and appending blooms for files they created
  * ([[update]]); whole-table rewrites ([[Compactor.compact]]) and
  * KeyedDelta (key-clustered stores that never need this index) simply
  * [[drop]] it.
  *
  * Scale shape: build is one shuffle of (file, key) pairs with one
  * bloom per group; lookup is DISTRIBUTED (the sidecar frame is
  * filtered by a bloom-test against the broadcast key set), so the
  * driver never holds all blooms — at 800k files x ~1 MB blooms the
  * sidecar is ~TB-scale like Hudi's footer blooms, and only matching
  * paths come back. FPP is 0.001 so a 100-key batch falsely flags
  * ~0.1% of files.
  */
object KeyIndex {

  val DirName = "_graft_keyindex"
  val Fpp = 0.001

  /** Canonical URI form shared by manifest paths and `input_file_name`
    * outputs ("file:///x" and "file:/x" must compare equal).
    */
  def norm(s: String): String = {
    val u = new org.apache.hadoop.fs.Path(s).toUri
    (Option(u.getScheme).map(_ + ":").getOrElse("")) + u.getPath
  }

  def path(dir: String): java.nio.file.Path =
    java.nio.file.Paths.get(dir, DirName)

  def exists(dir: String): Boolean = {
    val p = path(dir)
    java.nio.file.Files.exists(p) && {
      // close the listing stream — it holds a directory fd, and this
      // runs on every upsert/KeyedDelta (a streaming sink leaks fds
      // until GC otherwise)
      val s = java.nio.file.Files.list(p)
      try s.findFirst().isPresent finally s.close()
    }
  }

  def drop(dir: String): Unit = {
    def rec(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rec)); f.delete()
    }
    rec(path(dir).toFile)
  }

  /** Keys are indexed through `cast("long")` on BOTH the build and the
    * lookup side, so a non-integral (double/decimal) record key
    * truncates identically everywhere: two distinct keys that collide
    * after truncation only widen the bloom's effective membership —
    * false positives, never a missed file.
    */
  private def bloomOf(keys: Iterator[Long], expected: Long): Array[Byte] = {
    val bf = org.apache.spark.util.sketch.BloomFilter
      .create(math.max(1L, expected), Fpp)
    keys.foreach(bf.putLong)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** One bloom row per file of `files` (their data read fresh — used
    * for both the full build and the per-mutation delta).
    */
  private def bloomRows(spark: SparkSession, dir: String, key: String,
      files: Seq[FileEntry], partitioned: Boolean): DataFrame = {
    import spark.implicits._
    val maxRows = files.map(_.rows).max
    val df = StagedRewrite
      .readFiles(spark, dir, files.map(_.path), partitioned)
    // input_file_name is the runtime path; [[norm]] makes it and the
    // manifest's stored paths compare equal
    val wanted = files.map(f => norm(f.path) -> f.rows).toMap
    df.select(input_file_name().as("path"), col(key).cast("long").as("__k"))
      .filter(col("__k").isNotNull)
      .as[(String, Long)]
      .groupByKey(t => norm(t._1))
      .mapGroups { (p, it) =>
        (p, wanted.getOrElse(p, maxRows), bloomOf(it.map(_._2), maxRows))
      }
      .toDF("path", "rows", "bloom")
  }

  /** Build (or rebuild) the index for every file in the manifest. */
  def build(spark: SparkSession, dir: String): Unit = {
    val manifest = ZoneMap.read(dir)
    val key = manifest.recordKey.getOrElse(
      throw new IllegalArgumentException(s"$dir has no recordKey"))
    if (java.nio.file.Files.exists(path(dir))) drop(dir)
    bloomRows(spark, dir, key, manifest.files,
        manifest.hivePartitions.nonEmpty)
      .write.mode("overwrite").parquet(path(dir).toString)
  }

  /** The file paths (URI form) that MAY contain one of `keys`, plus
    * every manifest file missing from the sidecar (fail-safe). None
    * when no index exists.
    */
  def affectedPaths(spark: SparkSession, dir: String,
      keys: Seq[Long]): Option[Set[String]] = {
    if (!exists(dir)) return None
    val bc = spark.sparkContext.broadcast(keys.toArray)
    import spark.implicits._
    val hit = spark.read.parquet(path(dir).toString)
      .select(col("path"), col("bloom")).as[(String, Array[Byte])]
      .mapPartitions { it =>
        val ks = bc.value
        it.flatMap { case (p, bytes) =>
          val bf = org.apache.spark.util.sketch.BloomFilter
            .readFrom(new java.io.ByteArrayInputStream(bytes))
          if (ks.exists(bf.mightContainLong)) Some((p, true)) else Some((p, false))
        }
      }.collect()
    val indexed = hit.map(_._1).toSet
    val matching = hit.collect { case (p, true) => p }.toSet
    val unindexed = ZoneMap.read(dir).files.map(f => norm(f.path))
      .filterNot(indexed).toSet
    Some(matching ++ unindexed)
  }

  /** Post-mutation maintenance: drop superseded paths, append blooms
    * for the files the mutation created. Runs AFTER the manifest
    * commit — a crash in between leaves missing entries, which the
    * lookup treats as affected.
    */
  def update(spark: SparkSession, dir: String, removedPaths: Seq[String],
      added: Seq[FileEntry]): Unit = {
    if (!exists(dir)) return
    val manifest = ZoneMap.read(dir)
    val key = manifest.recordKey.getOrElse(return)
    val removed = removedPaths.map(norm).toSet
    val kept0 = spark.read.parquet(path(dir).toString)
    val kept = if (removed.isEmpty) kept0
      else kept0.filter(!col("path").isInCollection(removed.toSeq))
    val next = if (added.isEmpty) kept
      else kept.unionByName(bloomRows(spark, dir, key, added,
        manifest.hivePartitions.nonEmpty))
    // stage + swap: the sidecar read above is lazy until the write
    val tmp = path(dir).toString + ".tmp"
    next.write.mode("overwrite").parquet(tmp)
    drop(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(path(dir).toString))
  }
}
