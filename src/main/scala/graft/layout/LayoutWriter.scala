package graft.layout

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.curve.{Curves, CurveExpressions}

/** Physical-layout writer — the reference's L1–L8 operator family
  * (reference: lakehouse_op/delta_write_layout.py:165-280,
  * hudi_write_layout.py:111-228, iceberg_write_layout.py:68-265) on plain
  * parquet + our zone-map manifest.
  *
  * Layouts:
  *  - `baseline`: write as-loaded (delta_write_layout.py:107,253)
  *  - `linear`:   repartitionByRange + sortWithinPartitions on the layout
  *                columns (delta_write_layout.py:165-181)
  *  - `zorder`:   Morton curve key; repartitionByRange + sort on the key
  *                (delegated in the reference: delta OPTIMIZE ZORDER BY)
  *  - `hilbert`:  Hilbert curve key (Hudi-only in the reference)
  *
  * The curve key is a codegen'd Catalyst expression over normalized
  * coordinates, so the pre-write sort stays inside whole-stage codegen.
  * Range-partitioning by the key gives near-global curve order with
  * bounded per-task memory — the multi-executor-safe equivalent of a
  * global sort, which is exactly how the engines implement clustering.
  */
object LayoutWriter {

  case class LayoutSpec(
      layout: String, // baseline | linear | zorder | hilbert
      cols: Seq[String] = Nil,
      bits: Option[Int] = None,
      numFiles: Option[Int] = None, // None → leave input partitioning
      recordKey: Option[String] = None,
      precombineCol: Option[String] = None,
      partitionBy: Seq[String] = Nil) // hive-style partition dirs (S3/P8)

  /** Columns the manifest keeps stats for: layout cols always; callers can
    * pass extras (e.g. partition-ish columns queried with equality).
    */
  def write(
      df: DataFrame,
      dir: String,
      spec: LayoutSpec,
      extraStatsCols: Seq[String] = Nil): TableManifest = {
    val spark = df.sparkSession
    require(
      Seq("baseline", "linear", "zorder", "hilbert").contains(spec.layout),
      s"unknown layout ${spec.layout}")
    val missing = spec.cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"layout columns not in schema: $missing")

    val bits = spec.bits.getOrElse(Curves.bitsFor(spec.cols.length))
    val arranged = spec.layout match {
      case "baseline" =>
        spec.numFiles.map(df.repartition).getOrElse(df)
      case "linear" =>
        val cs = spec.cols.map(col)
        val parted = spec.numFiles
          .map(n => df.repartitionByRange(n, cs: _*))
          .getOrElse(df.repartitionByRange(cs: _*))
        parted.sortWithinPartitions(cs: _*)
      case curve @ ("zorder" | "hilbert") =>
        val key = curveKey(df, spec.cols, bits, curve)
        val parted = spec.numFiles
          .map(n => df.repartitionByRange(n, key))
          .getOrElse(df.repartitionByRange(key))
        parted.sortWithinPartitions(key)
    }
    val writer = arranged.write.mode("overwrite")
    (if (spec.partitionBy.nonEmpty) writer.partitionBy(spec.partitionBy: _*)
     else writer).parquet(dir)

    // Partition columns live in dir paths, not files, but come back as
    // regular columns on read — the per-file stats job sees them, so the
    // manifest prunes on them like any other column (partition pruning).
    // The record key always gets stats: Upserter's file-scoped COW needs
    // key zones to avoid rewriting the whole table.
    val statsCols =
      (spec.cols ++ spec.partitionBy ++ spec.recordKey.toSeq ++ extraStatsCols).distinct
    val files = ZoneMap.collectStats(spark, dir, statsCols)
    val manifest = TableManifest(
      layout = spec.layout,
      layoutCols = spec.cols,
      bits = bits,
      statsCols = statsCols,
      recordKey = spec.recordKey,
      precombineCol = spec.precombineCol,
      files = files,
      partitionCols = if (spec.partitionBy.nonEmpty) Some(spec.partitionBy) else None)
    ZoneMap.write(dir, manifest)
    manifest
  }

  /** The ordering key(s) for a layout: the curve key for zorder/hilbert,
    * the raw columns for linear, nothing for baseline.
    */
  def curveKeyOrCols(
      df: DataFrame, cols: Seq[String], bits: Int, layout: String): Seq[Column] =
    layout match {
      case "zorder" | "hilbert" => Seq(curveKey(df, cols, bits, layout))
      case "linear" => cols.map(col)
      case _ => Nil
    }

  /** Curve-key expression: normalize each layout column to [0, 2^bits)
    * using its global min/max (one small agg — 2 doubles per column), then
    * interleave. Null coordinates sort to the curve origin.
    */
  def curveKey(df: DataFrame, cols: Seq[String], bits: Int, curve: String): Column = {
    val bounds = colBounds(df, cols)
    val norms = cols.map { c =>
      val (lo, hi) = bounds(c)
      CurveExpressions.normalizedCol(doubleView(df, c), lo, hi, bits)
    }
    if (curve == "hilbert") CurveExpressions.hilbertvalue(bits, norms: _*)
    else CurveExpressions.zvalue(bits, norms: _*)
  }

  /** Double view of a column for normalization (dates → days, timestamps →
    * epoch seconds, strings → a lexicographic prefix code so string
    * columns can participate in curve keys).
    */
  private def doubleView(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case _: NumericType => col(c).cast(DoubleType)
      case DateType => datediff(col(c), lit("1970-01-01").cast(DateType)).cast(DoubleType)
      case TimestampType | TimestampNTZType =>
        // NTZ values are interpreted in the (UTC) session zone — only the
        // ordering matters for curve coordinates. Fractional seconds via
        // a double cast (matches ZoneMap's stats domain).
        col(c).cast(TimestampType).cast(DoubleType)
      case StringType => stringPrefixCode(col(c))
      case dt => throw new IllegalArgumentException(s"cannot curve-order $c: $dt")
    }

  /** Order-preserving 4-byte prefix code for strings (byte0*2^24 + ...). */
  private def stringPrefixCode(c: Column): Column = {
    val b = (i: Int) =>
      coalesce(ascii(substring(c, i + 1, 1)), lit(0)).cast(DoubleType)
    b(0) * lit(16777216d) + b(1) * lit(65536d) + b(2) * lit(256d) + b(3)
  }

  private def colBounds(df: DataFrame, cols: Seq[String]): Map[String, (Double, Double)] = {
    val aggs = cols.flatMap { c =>
      val d = doubleView(df, c)
      Seq(min(d).as(s"__lo_$c"), max(d).as(s"__hi_$c"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.map { c =>
      val lo = Option(r.getAs[java.lang.Double](s"__lo_$c")).map(_.doubleValue).getOrElse(0d)
      val hi = Option(r.getAs[java.lang.Double](s"__hi_$c")).map(_.doubleValue).getOrElse(0d)
      c -> (lo, hi)
    }.toMap
  }
}
