package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join — for every left row, attach the single
  * most recent right row whose timestamp is at or before the left row's,
  * matching on equality keys; left rows with no prior right row are
  * NULL-extended (left-join semantics). The workhorse of training-data
  * feature attachment (label each interaction with the latest prior
  * profile/feature snapshot) and the semantics of DuckDB's
  * `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`.
  *
  * Spark has no native as-of join, and the naive formulations do not
  * scale: a range join (`l.k = r.k AND r.ts <= l.ts` + window-max) emits
  * O(pairs-within-range) intermediate rows, and per-row subqueries don't
  * distribute at all. This implementation is the canonical single-pass
  * union trick:
  *
  *   1. tag right rows side=0 carrying their value columns, left rows
  *      side=1 carrying NULLs for them;
  *   2. union and run ONE window: partitionBy(keys),
  *      orderBy(ts, side, tieBreak), frame = unbounded-preceding..current,
  *      `last(value, ignoreNulls)` — each left row sees exactly the
  *      latest right value at-or-before it (side 0 < 1 makes an
  *      equal-timestamp right row visible to the left row, matching the
  *      `>=` in the ASOF condition; `tieBreak` makes the winner among
  *      equal right timestamps deterministic);
  *   3. keep side=1 rows.
  *
  * Cost = one shuffle of |L|+|R| rows on the keys plus an in-partition
  * sort — no pair blow-up, no broadcast of either side, and Catalyst
  * runs the window with partial aggregation-free streaming frames. At
  * 100 TB the shuffle is key-partitioned; a pathologically hot key is
  * bounded by its own event count, and time-bucketing the key (salt by
  * coarse ts bucket, as-of within bucket, patch bucket boundaries with
  * the previous bucket's final value) is the standard refinement.
  */
object AsOfJoin {

  /** @param valueCols right-side columns to attach (names must not
    *                  collide with left columns)
    * @param tieBreak  right-side column ordering equal-timestamp right
    *                  rows (the max wins); pick a unique id for
    *                  deterministic results
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String],
      tieBreak: String): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must name at least one column")
    val leftCols = left.columns.toSeq
    require(valueCols.forall(!leftCols.contains(_)),
      s"valueCols collide with left columns: ${valueCols.filter(leftCols.contains)}")
    val leftPayload = leftCols.filterNot(keys.contains)

    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
          col(tieBreak).as("__tb")) ++
        valueCols.map(col) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
          lit(null).cast(right.schema(tieBreak).dataType).as("__tb")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftPayload.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(taggedRight.unionByName(taggedLeft)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select((keys ++ leftPayload ++ valueCols).map(col): _*)
  }

  /** Convenience overload when both sides share the timestamp column
    * name.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, valueCols: Seq[String], tieBreak: String): DataFrame = {
    // the left payload keeps its own ts column; rename the right's so
    // the union tags don't collide with it
    asOf(left, right.withColumnRenamed(ts, s"__r_$ts"), keys,
      ts, s"__r_$ts", valueCols, tieBreak)
  }
}
