package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset profiler — the reference's wlg profiler (F1–F6; reference:
  * wlg/profiler/stats.py:14-198) re-expressed as Spark aggregations so it
  * scales to the full table instead of a 20k-row driver-side sample.
  *
  * Per column: kind, count, nulls, min/max, quantiles (exact at the
  * reference's 7 probes via approx with tight eps — or exact percentile
  * for numerics), cardinality (HLL approx, reference caps an exact count
  * at 20k: stats.py:180), top-k frequent values (K=50: stats.py:104),
  * equi-width histogram (<=64 bins: stats.py:94).
  *
  * Everything is one scan per concern: a single multi-aggregate job for
  * the scalar stats, one groupBy per top-k/histogram column. No collect
  * of raw data — only finished stats reach the driver.
  */
object Profiler {

  val QuantileProbes: Seq[Double] = Seq(0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99)
  val TopK = 50
  val MaxBins = 64

  sealed trait Kind
  case object NumericKind extends Kind
  case object DatetimeKind extends Kind
  case object BooleanKind extends Kind
  case object CategoricalKind extends Kind

  /** Kind inference straight from the Spark type (reference infers from
    * pandas dtypes: wlg/profiler/stats.py:201-210).
    */
  def kindOf(dt: DataType): Kind = dt match {
    case _: NumericType => NumericKind
    case DateType | TimestampType | TimestampNTZType => DatetimeKind
    case BooleanType => BooleanKind
    case _ => CategoricalKind
  }

  case class ColumnStats(
      name: String,
      kind: String,
      count: Long,
      nulls: Long,
      min: Option[Double],
      max: Option[Double],
      quantiles: Map[String, Double],
      cardinality: Long,
      topk: Seq[(String, Long)],
      histogram: Option[(Seq[Double], Seq[Long])]) // (edges, counts)

  case class TableStats(
      rows: Long,
      columns: Seq[ColumnStats],
      correlations: Seq[(String, String, Double)])

  /** Numeric view used for stats (datetimes → epoch seconds/days, the
    * reference normalizes datetimes to epoch millis: stats.py:212-218).
    */
  private def numView(dt: DataType, c: String): Option[Column] = dt match {
    case _: NumericType => Some(col(c).cast(DoubleType))
    case DateType => Some(datediff(col(c), lit("1970-01-01").cast(DateType)).cast(DoubleType))
    case TimestampType | TimestampNTZType =>
      Some(unix_timestamp(col(c).cast(TimestampType)).cast(DoubleType))
    case _ => None
  }

  def profile(df: DataFrame, corrPairs: Int = 20): TableStats = {
    val schema = df.schema
    val cols = schema.fields.toSeq

    // Pass 1: one wide aggregate for count/nulls/min/max/ndv per column.
    val aggs = cols.flatMap { f =>
      val base = Seq(
        count(col(f.name)).as(s"__cnt_${f.name}"),
        approx_count_distinct(col(f.name)).as(s"__ndv_${f.name}"))
      numView(f.dataType, f.name) match {
        case Some(nv) =>
          base ++ Seq(min(nv).as(s"__min_${f.name}"), max(nv).as(s"__max_${f.name}"))
        case None => base
      }
    } :+ count(lit(1)).as("__rows")
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val rows = r.getAs[Long]("__rows")

    // Pass 2: per-numeric-column quantiles (approx, eps 0.001).
    val numericCols = cols.filter(f => numView(f.dataType, f.name).isDefined)
    val numViewDf = df.select(numericCols.map(f =>
      numView(f.dataType, f.name).get.as(f.name)): _*)
    val quantiles: Map[String, Seq[Double]] = numericCols.map { f =>
      f.name -> numViewDf.stat
        .approxQuantile(f.name, QuantileProbes.toArray, 0.001).toSeq
    }.toMap

    // Pass 3: top-k for categorical/boolean columns (reference K=50).
    val catCols = cols.filter(f => kindOf(f.dataType) match {
      case CategoricalKind | BooleanKind => true
      case _ => false
    })
    val topks: Map[String, Seq[(String, Long)]] = catCols.map { f =>
      f.name -> df
        .filter(col(f.name).isNotNull) // reference counts non-null values
        .groupBy(col(f.name).cast(StringType).as("v"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("v"))
        .limit(TopK)
        .collect()
        .toSeq
        .map(row => (row.getString(0), row.getLong(1)))
    }.toMap

    // Pass 4: equi-width histograms for numeric columns (<=64 bins,
    // sqrt(n) rule like the reference: stats.py:94).
    val bins = math.min(MaxBins, math.max(1, math.sqrt(rows.toDouble).toInt))
    val histograms: Map[String, (Seq[Double], Seq[Long])] = numericCols.flatMap { f =>
      val lo = Option(r.getAs[java.lang.Double](s"__min_${f.name}")).map(_.doubleValue)
      val hi = Option(r.getAs[java.lang.Double](s"__max_${f.name}")).map(_.doubleValue)
      (lo, hi) match {
        case (Some(l), Some(h)) if h > l =>
          val w = (h - l) / bins
          val bucket = least(lit(bins - 1),
            floor((col(f.name) - lit(l)) / lit(w)).cast(IntegerType))
          val counts = numViewDf
            .filter(col(f.name).isNotNull)
            .groupBy(bucket.as("b")).agg(count(lit(1)).as("c"))
            .collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
          val edges = (0 to bins).map(i => l + i * w)
          Some(f.name -> (edges, (0 until bins).map(i => counts.getOrElse(i, 0L))))
        case _ => None
      }
    }.toMap

    // Pass 5: Pearson correlations for top numeric pairs (reference:
    // stats.py:283-310 ranks top-20 pairs by |corr|).
    val corrs =
      if (numericCols.length < 2) Nil
      else {
        val pairs = for {
          i <- numericCols.indices; j <- (i + 1) until numericCols.length
        } yield (numericCols(i).name, numericCols(j).name)
        val corrAggs = pairs.map { case (a, b) =>
          corr(col(a), col(b)).as(s"__corr_${a}__$b")
        }
        val cr = numViewDf.agg(corrAggs.head, corrAggs.tail: _*).collect()(0)
        pairs
          .map { case (a, b) =>
            (a, b, Option(cr.getAs[java.lang.Double](s"__corr_${a}__$b"))
              .map(_.doubleValue).getOrElse(Double.NaN))
          }
          .filterNot(_._3.isNaN)
          .sortBy { case (_, _, c) => -math.abs(c) }
          .take(corrPairs)
      }

    val colStats = cols.map { f =>
      val cnt = r.getAs[Long](s"__cnt_${f.name}")
      ColumnStats(
        name = f.name,
        kind = kindOf(f.dataType).toString.stripSuffix("Kind").toLowerCase,
        count = cnt,
        nulls = rows - cnt,
        min = if (numView(f.dataType, f.name).isDefined)
          Option(r.getAs[java.lang.Double](s"__min_${f.name}")).map(_.doubleValue)
        else None,
        max = if (numView(f.dataType, f.name).isDefined)
          Option(r.getAs[java.lang.Double](s"__max_${f.name}")).map(_.doubleValue)
        else None,
        quantiles = quantiles.get(f.name)
          .map(qs => QuantileProbes.map(_.toString).zip(qs).toMap)
          .getOrElse(Map.empty),
        cardinality = r.getAs[Long](s"__ndv_${f.name}"),
        topk = topks.getOrElse(f.name, Nil),
        histogram = histograms.get(f.name))
    }
    TableStats(rows, colStats, corrs)
  }
}
