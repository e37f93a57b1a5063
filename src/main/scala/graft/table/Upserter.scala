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

  /** Upsert `batch` into the layout table at `dir`. Returns the refreshed
    * manifest. Record key and precombine column come from the manifest.
    */
  def upsert(spark: SparkSession, dir: String, batch: DataFrame): TableManifest = {
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

    // File-scoped COW: find files whose key zone intersects the batch keys.
    val Seq(kLo, kHi) = alignedBatch
      .agg(min(col(key).cast("double")), max(col(key).cast("double")))
      .collect()(0).toSeq.map(v => Option(v).map(_.asInstanceOf[Double]).getOrElse(0d))
    val (affected, untouched) =
      if (manifest.statsCols.contains(key))
        manifest.files.partition(f => NumBetween(key, kLo, kHi).mayMatch(f))
      else (manifest.files, Seq.empty[FileEntry])

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

    // Stage the rewrite, then move the (uuid-unique) part files in —
    // under their partition subdirs when the table is hive-partitioned.
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = dir.stripSuffix("/") + ".upsert_tmp"
    val moved = StagedRewrite.writeAndMove(
      spark, dir, staging, deduped, manifest.hivePartitions)

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
    updated
  }
}
