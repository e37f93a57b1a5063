package graft.layout

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.Path

/** Bin-packing compaction — the reference's L5 (Delta OPTIMIZE
  * executeCompaction, Iceberg rewrite_data_files binpack, Hudi small-file
  * clustering; reference: lakehouse_op/delta_write_layout.py:199-209,
  * iceberg_write_layout.py:215-224, hudi_write_layout.py:119-123).
  *
  * Rewrites a table dir into files of ~targetFileBytes, preserving the
  * recorded layout order (re-runs the layout sort so compaction never
  * degrades clustering), then refreshes the manifest. Writes to a temp
  * dir and renames for crash safety (no half-compacted table visible).
  */
object Compactor {

  val DefaultTargetFileBytes: Long = 128L * 1024 * 1024 // reference default

  def compact(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = DefaultTargetFileBytes): TableManifest = {
    val manifest = ZoneMap.read(dir)
    val df = spark.read.parquet(dir)

    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new Path(dir)).getLength
    val numFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)

    val tmp = dir.stripSuffix("/") + ".compact_tmp"
    val spec = LayoutWriter.LayoutSpec(
      layout = manifest.layout,
      cols = manifest.layoutCols,
      bits = Some(manifest.bits),
      numFiles = Some(numFiles),
      recordKey = manifest.recordKey,
      precombineCol = manifest.precombineCol)
    LayoutWriter.write(df, tmp, spec, manifest.statsCols.diff(manifest.layoutCols))

    val dst = new Path(dir)
    val bak = new Path(dir.stripSuffix("/") + ".compact_old")
    fs.delete(bak, true)
    fs.rename(dst, bak)
    fs.rename(new Path(tmp), dst)
    fs.delete(bak, true)
    // Manifest paths referenced the tmp dir; rebuild against the final path.
    val files = ZoneMap.collectStats(spark, dir, manifest.statsCols)
    val fixed = manifest.copy(files = files)
    ZoneMap.write(dir, fixed)
    fixed
  }
}
