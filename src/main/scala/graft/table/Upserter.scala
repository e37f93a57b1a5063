package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path
import graft.layout._

/** Keyed copy-on-write upsert on a plain-parquet + zone-map table — the
  * reference's L9 (Hudi upsert with record key + precombine field;
  * reference: lakehouse_op/hudi_upsert.py:114-280, payload semantics of
  * OverwriteWithLatestAvroPayload: latest precombine wins, incoming wins
  * ties).
  *
  * Scale design (copy-on-write, file-scoped): only files whose record-key
  * zone intersects the batch's key range are rewritten; untouched files
  * and their manifest entries survive as-is. Cost is O(affected files +
  * batch), not O(table) — the same asymptotics as Hudi COW.
  */
object Upserter {

  /** Align `batch` to `schema`: add missing columns as typed nulls, cast
    * matching ones, project in table order (reference 3-tier align:
    * hudi_upsert.py:114-162 — tier 1, Spark schema read, suffices here).
    */
  def alignSchema(batch: DataFrame, schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val aligned = schema.fields.foldLeft(batch) { (df, f) =>
      if (df.columns.contains(f.name)) df
      else df.withColumn(f.name, lit(null).cast(f.dataType))
    }
    aligned.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
  }

  /** Above this many distinct batch keys the affected-file test falls
    * back from the exact key-set (NumIn) to the key RANGE: the driver
    * collect stays bounded, and a batch that large intersects most
    * zones anyway.
    */
  val KeyPruneLimit: Int = 100000

  /** What [[upsertResult]] reports: the refreshed manifest and whether
    * the auto-recluster policy fired after the commit.
    */
  case class UpsertResult(manifest: TableManifest, reclustered: Boolean)

  /** Upsert `batch` into the layout table at `dir`. Returns the refreshed
    * manifest. Record key and precombine column come from the manifest.
    *
    *  - `sortRewrites`: re-run the recorded layout sort WITHIN the
    *    rewritten file set (range-partitioned on the layout key), so a
    *    scattered upsert degrades pruning proportionally to the bytes it
    *    touches instead of collapsing it to 1x (the RQ7 decay cliff,
    *    results/rq7_layout/). Off by default — the unsorted path is the
    *    plain Hudi-COW analog the decay study measures.
    *  - `autoRecluster`: after the commit, [[graft.layout.Compactor
    *    .maybeRecluster]] re-clusters the whole table iff the manifest's
    *    clustering health crossed the decay threshold (manifest math
    *    only when healthy). On by default: an unattended update stream
    *    self-heals.
    */
  def upsert(spark: SparkSession, dir: String, batch: DataFrame,
      sortRewrites: Boolean = false, autoRecluster: Boolean = true,
      targetFileBytes: Long = Compactor.DefaultTargetFileBytes): TableManifest =
    upsertResult(spark, dir, batch, sortRewrites, autoRecluster,
      targetFileBytes).manifest

  def upsertResult(spark: SparkSession, dir: String, batch: DataFrame,
      sortRewrites: Boolean = false, autoRecluster: Boolean = true,
      targetFileBytes: Long = Compactor.DefaultTargetFileBytes): UpsertResult = {
    val manifest = ZoneMap.read(dir)
    // entry reconcile (round-11 ADVICE): purge manifest-unreferenced part
    // files a crashed prior mutation may have left behind
    StagedRewrite.reconcile(spark, dir, manifest)
    val partitioned = manifest.hivePartitions.nonEmpty
    val key = manifest.recordKey.getOrElse(
      throw new IllegalArgumentException(s"$dir has no recordKey — cannot upsert"))
    val precombine = manifest.precombineCol

    val table = spark.read.parquet(dir)
    val alignedBatch = alignSchema(batch, table.schema)

    // File-scoped COW: find files whose key zone intersects the batch
    // keys — by exact key SET when the distinct keys fit the driver
    // bound (scattered keys then only touch the files that actually
    // hold them: a 1k-key batch over an 800k-file table rewrites <=1k
    // file groups, where the [min,max] range test would rewrite all),
    // by key range otherwise. Both are sound over the same double-cast
    // the zone stats use.
    val keyIsNumeric = {
      import org.apache.spark.sql.types._
      table.schema(key).dataType match {
        case _: NumericType | DateType | TimestampType | TimestampNTZType => true
        case _ => false
      }
    }
    val batchKeys: Option[Seq[Double]] =
      if (!keyIsNumeric || !manifest.statsCols.contains(key)) None
      else {
        val rows = alignedBatch.select(col(key).cast("double"))
          .filter(col(key).isNotNull).distinct()
          .limit(KeyPruneLimit + 1).collect()
        if (rows.length > KeyPruneLimit) None
        else Some(rows.map(_.getDouble(0)).toSeq)
      }
    val (affected0, untouched0) =
      if (manifest.statsCols.contains(key)) {
        val pred: ZonePredicate = batchKeys match {
          case Some(ks) => NumIn(key, ks)
          case None =>
            val Seq(kLo, kHi) = alignedBatch
              .agg(min(col(key).cast("double")), max(col(key).cast("double")))
              .collect()(0).toSeq
              .map(v => Option(v).map(_.asInstanceOf[Double]).getOrElse(0d))
            NumBetween(key, kLo, kHi)
        }
        manifest.files.partition(pred.mayMatch)
      } else (manifest.files, Seq.empty[FileEntry])
    // Key-index refinement (round 13): on a layout ORTHOGONAL to the
    // record key every file's key zone spans the whole domain and the
    // zone test above keeps everything; the per-file bloom sidecar
    // (KeyIndex.build, the Hudi bloom-index analog) drops every
    // indexed file whose bloom excludes all batch keys. Fail-safe:
    // blooms only false-positive, unindexed files stay affected.
    val (affected, untouched) = batchKeys match {
      case Some(ks) if KeyIndex.exists(dir) =>
        KeyIndex.affectedPaths(spark, dir, ks.map(_.toLong)) match {
          case Some(paths) =>
            val (a, skipped) = affected0.partition(f =>
              paths.contains(KeyIndex.norm(f.path)))
            (a, untouched0 ++ skipped)
          case None => (affected0, untouched0)
        }
      case _ => (affected0, untouched0)
    }

    val existing =
      if (affected.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], table.schema)
      else StagedRewrite.readFiles(spark, dir, affected.map(_.path), partitioned)

    // Dedup: max precombine wins; the incoming batch wins ties (__src=1).
    val merged = existing.withColumn("__src", lit(0))
      .unionByName(alignedBatch.withColumn("__src", lit(1)))
    val ordered = precombine match {
      case Some(pc) => Window.partitionBy(col(key))
        .orderBy(col(pc).desc, col("__src").desc)
      case None => Window.partitionBy(col(key)).orderBy(col("__src").desc)
    }
    val deduped = merged
      .withColumn("__rn", row_number().over(ordered))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")

    // Size the rewrite by the affected bytes (Hudi sizes COW file
    // groups the same way) — without this the rewrite inherits the
    // dedup window's shuffle width and a 51-file table becomes a
    // 102-tiny-file one in a single upsert (the round-12 rq7 run).
    // The width is floored by the same 32 MB-of-parquet-per-partition
    // band Sessions.shufflePartitionsFor enforces: a whole-table
    // scattered rewrite packed into target-sized (128 MB) partitions
    // OOMed the 8 GB bench JVM at sf16 (round 13) — rewrite files may
    // come out under target, never partitions over the memory band.
    val affectedBytes = affected.flatMap(_.bytes).sum
    val numFiles = {
      val byTarget = math.max(1, math.min(
        // never explode a partial rewrite into more files than a
        // bytes-blind heuristic of one file per affected file + 1
        affected.length + 1,
        math.ceil(affectedBytes.toDouble / targetFileBytes).toInt))
      math.max(byTarget,
        math.ceil(affectedBytes.toDouble / (32L * 1024 * 1024)).toInt)
    }
    // sorted COW: the rewritten rows re-enter the recorded layout
    // order, so each new file's zones stay as tight as the merged
    // key span allows ("baseline" layouts have no keys and stay on
    // the plain path)
    val sortKeys =
      if (!sortRewrites || manifest.layoutCols.isEmpty) Nil
      else LayoutWriter.curveKeyOrCols(
        deduped, manifest.layoutCols, manifest.bits, manifest.layout)
    val arranged =
      if (sortKeys.isEmpty) deduped.repartition(numFiles)
      else if (numFiles == 1)
        deduped.repartition(1).sortWithinPartitions(sortKeys: _*)
      else deduped.repartitionByRange(numFiles, sortKeys: _*)
        .sortWithinPartitions(sortKeys: _*)

    // Stage the rewrite, then move the (uuid-unique) part files in —
    // under their partition subdirs when the table is hive-partitioned.
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = dir.stripSuffix("/") + ".upsert_tmp"
    val moved = StagedRewrite.writeAndMove(
      spark, dir, staging, arranged, manifest.hivePartitions)

    // Manifest: stats for the new files only (distributed scan of just
    // those files), untouched entries carried over.
    val newEntries =
      if (moved.isEmpty) Seq.empty[FileEntry]
      else ZoneMap.collectStatsDf(
        StagedRewrite.readFiles(spark, dir, moved, partitioned), manifest.statsCols)
    val updated = manifest.copy(files = untouched ++ newEntries)
    // commit order matches KeyedDelta (round-11 ADVICE): atomically
    // publish the manifest FIRST, delete superseded files after — a
    // crash in between leaves orphan old files a manifest-driven reader
    // never sees, never a manifest referencing deleted files.
    ZoneMap.write(dir, updated)
    StagedRewrite.deleteFiles(fs, affected)
    spark.catalog.refreshByPath(dir)
    // index maintenance AFTER the commit: a crash in between leaves
    // the new files unindexed, which the lookup treats as affected
    KeyIndex.update(spark, dir, affected.map(_.path), newEntries)
    if (!autoRecluster) UpsertResult(updated, reclustered = false)
    else Compactor.maybeRecluster(spark, dir,
        targetFileBytes = targetFileBytes) match {
      case Some(m) => UpsertResult(m, reclustered = true)
      case None => UpsertResult(updated, reclustered = false)
    }
  }
}
