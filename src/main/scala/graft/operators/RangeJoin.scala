package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval join via bin bucketing.
  *
  * Spark plans a pure range predicate (`p.ts BETWEEN i.lo AND i.hi`)
  * with no equality conjunct as BroadcastNestedLoopJoin — O(|P|·|I|)
  * probes and a broadcast of one whole side, which dies at scale. The
  * bucketing trick restores an equi-join: pick a bin width w, replicate
  * each interval to every bin it overlaps (ceil(len/w)+1 bins), map
  * each point to exactly ONE bin, and join on bin id with the exact
  * range predicate as a residual filter. A point's bin is unique, so a
  * matching pair meets in exactly one bucket — no post-join dedup.
  * The plan becomes shuffle-on-bin SortMergeJoin/ShuffledHashJoin:
  * partitionable, AQE-skew-splittable, linear in |P| + replicated |I|.
  *
  * Cost model: replication factor = avg_interval_len/w + 1; probe
  * selectivity per bucket = w (bigger bins = fewer copies but more
  * false candidates). w ≈ median interval length is a good default —
  * callers pass it explicitly (it is data knowledge, not a tunable).
  *
  * Greenfield (no reference counterpart); complements AsOfJoin for the
  * "attach events inside a window" pipeline step.
  */
object RangeJoin {

  /** Exact floor division for longs: subtract the (always non-negative)
    * pmod first, so the integral `div` sees an exact multiple and sign
    * truncation can't bite. All-integer — no doubles (a double ulp at
    * epoch nanos is ~256 ns) and no decimal rounding (decimal division
    * half-up-rounds quotients within 5e-7 of an integer across a bin
    * boundary).
    */
  private def floorDiv(e: String, w: Long): Column =
    expr(s"(($e) - pmod(($e), ${w}L)) div ${w}L")

  /** Median interval length — the bin-width default the cost model
    * recommends (replication ~2x, residual selectivity ~1 bin). One
    * tiny approx-percentile aggregate over the interval frame; callers
    * that know their data can still pass an explicit width.
    */
  def autoBinWidth(intervals: DataFrame, loCol: String, hiCol: String): Long = {
    // cast: approx_percentile returns the input type — for INT/SHORT
    // interval columns (valid per pointInInterval's integral contract)
    // getLong on the raw result would ClassCastException
    val r = intervals.filter(col(loCol) < col(hiCol))
      .agg(expr(s"approx_percentile(`$hiCol` - `$loCol`, 0.5)")
        .cast("long").as("w"))
      .collect()(0)
    if (r.isNullAt(0)) 1L else math.max(r.getLong(0), 1L)
  }

  /** [[pointInInterval]] with the bin width derived from the data
    * (median interval length) instead of caller-supplied.
    */
  def pointInIntervalAuto(
      points: DataFrame, tsCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      maxBinsPerInterval: Int = 4096): DataFrame =
    pointInInterval(points, tsCol, intervals, loCol, hiCol,
      autoBinWidth(intervals, loCol, hiCol), maxBinsPerInterval)

  /** Inner-join `points` to `intervals` on
    * `points(tsCol)` ∈ [`intervals(loCol)`, `intervals(hiCol)`) —
    * half-open, all three columns integral (epoch micros, say).
    * Output: all point columns then all interval columns; callers
    * disambiguate duplicate names beforehand (plain join contract).
    *
    * `maxBinsPerInterval` guards the replication explode: a mis-sized
    * bin width (or a corrupt interval spanning years) fails fast with a
    * clear error instead of silently materializing millions of copies
    * per row.
    */
  def pointInInterval(
      points: DataFrame, tsCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long, maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn("__rj_bin", floorDiv(s"`$tsCol`", binWidth))
    val binLo = floorDiv(s"`$loCol`", binWidth)
    val binHi = floorDiv(s"`$hiCol` - 1", binWidth)
    val i = intervals
      .filter(col(loCol) < col(hiCol)) // empty intervals match nothing
      .withColumn("__rj_bin", explode(when(
        binHi - binLo < lit(maxBinsPerInterval.toLong),
        sequence(binLo, binHi)).otherwise(raise_error(concat(
        lit(s"RangeJoin: interval spans > $maxBinsPerInterval bins of $binWidth at "),
        col(loCol).cast("string"))))))
    p.join(i, p("__rj_bin") === i("__rj_bin")
        && p(tsCol) >= i(loCol) && p(tsCol) < i(hiCol))
      .drop("__rj_bin")
  }
}
