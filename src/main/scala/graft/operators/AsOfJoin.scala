package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join — for every left row, attach the single
  * nearest right row at-or-before (backward, default) or at-or-after
  * (forward) its timestamp, matching on equality keys; left rows with
  * no match are NULL-extended (left-join semantics). The workhorse of
  * training-data feature attachment (label each interaction with the
  * latest prior profile/feature snapshot); backward matches DuckDB's
  * `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`, and
  * direction/tolerance match pandas `merge_asof`.
  *
  * Spark has no native as-of join, and the naive formulations do not
  * scale: a range join (`l.k = r.k AND r.ts <= l.ts` + window-max) emits
  * O(pairs-within-range) intermediate rows, and per-row subqueries don't
  * distribute at all. This implementation is the canonical single-pass
  * union trick:
  *
  *   1. tag right rows side=0 carrying ONE struct of their value columns
  *      (+ their own ts, for tolerance), left rows side=1 carrying NULL
  *      for it — a struct, not per-column values, so the matched row is
  *      atomic (per-column `last(_, ignoreNulls)` would stitch values
  *      from DIFFERENT right rows when some value columns hold nulls);
  *   2. union and run ONE window: partitionBy(keys),
  *      orderBy(ts asc|desc by direction, side, tieBreak),
  *      frame = unbounded-preceding..current,
  *      `last(struct, ignoreNulls)` — each left row sees exactly the
  *      nearest right row on its side of time (side 0 sorts before 1 at
  *      equal timestamps, making equal-ts right rows visible — the `>=`
  *      in the ASOF condition; `tieBreak` makes the winner among equal
  *      right timestamps deterministic: the max wins);
  *   3. keep side=1 rows, null the match when it falls outside
  *      `tolerance`, unpack the struct.
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
    * @param direction "backward" (nearest right row at-or-before) or
    *                  "forward" (nearest at-or-after)
    * @param tolerance max distance between the left ts and the matched
    *                  right ts; farther matches are null-extended. Same
    *                  type algebra as the ts columns: an INTERVAL for
    *                  timestamps, a number for numeric ts
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String],
      tieBreak: String, direction: String = "backward",
      tolerance: Option[Column] = None): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must name at least one column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    require(valueCols.forall(!leftCols.contains(_)),
      s"valueCols collide with left columns: ${valueCols.filter(leftCols.contains)}")
    val leftPayload = leftCols.filterNot(keys.contains)

    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
          col(tieBreak).as("__tb"),
          struct(valueCols.map(col) :+ col(rightTs).as("__mts"): _*).as("__val")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val valType = taggedRight.schema("__val").dataType
    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
          lit(null).cast(right.schema(tieBreak).dataType).as("__tb"),
          lit(null).cast(valType).as("__val")) ++
        leftPayload.map(col): _*)

    val tsOrder = if (direction == "backward") col("__ts").asc else col("__ts").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__side").asc, col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = taggedRight.unionByName(taggedLeft)
      .withColumn("__val", last(col("__val"), ignoreNulls = true).over(w))
    val gap =
      if (direction == "backward") col("__ts") - col("__val.__mts")
      else col("__val.__mts") - col("__ts")
    val gated = tolerance match {
      case Some(tol) => filled.withColumn("__val",
        when(gap <= tol, col("__val"))) // null otherwise (incl. no match)
      case None => filled
    }
    gated.filter(col("__side") === 1)
      .select(keys.map(col) ++ leftPayload.map(col) ++
        valueCols.map(c => col(s"__val.$c").as(c)): _*)
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
