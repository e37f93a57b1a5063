package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Profiler operator surface as oracle-checked queries (reference
  * profiler: wlg/profiler/stats.py — histograms A11, null counts A13,
  * cardinality A8, top-k A9, correlations A14; our Spark-agg versions
  * scale to full tables instead of 20k-row samples).
  */
object ProfileQueries {

  private val Bins = 10

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Equi-width histogram of l_quantity: min/max from a broadcast scalar
    // subquery, then one hash agg — two scans, no sort, no collect.
    "q35_profile_hist" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
      val mm = li.agg(
        min(col("l_quantity")).as("lo"), max(col("l_quantity")).as("hi"))
      val bucket = least(lit(Bins - 1),
        floor((col("l_quantity") - col("lo")) / ((col("hi") - col("lo")) / Bins))
          .cast("int")).as("bucket")
      li.join(broadcast(mm))
        .groupBy(bucket)
        .agg(count(lit(1)).as("cnt"),
          round(min(col("l_quantity")), 6).as("bin_min"),
          round(max(col("l_quantity")), 6).as("bin_max"))
        .orderBy(col("bucket"))
    }),

    // Null counts + exact cardinality per profiled column (events table).
    "q36_profile_nulls_ndv" -> ((s, d) => {
      Tables.load(s, d, "events").agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("event_type").isNull, 1L).otherwise(0L)).as("nulls_event_type"),
        countDistinct(col("event_type")).as("ndv_event_type"),
        countDistinct(col("user_id")).as("ndv_user"),
        round(min(col("value")), 6).as("min_value"),
        round(max(col("value")), 6).as("max_value"))
    }),

    // Correlation matrix over three numeric columns (top pairs, A14).
    "q37_profile_corr_pairs" -> ((s, d) => {
      Tables.load(s, d, "lineitem").agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("c_qty_price"),
        round(corr(col("l_quantity"), col("l_discount")), 6).as("c_qty_disc"),
        round(corr(col("l_extendedprice"), col("l_discount")), 6).as("c_price_disc"))
    }),

    // A14 Spearman rank correlation — exact, via the distributed
    // average-rank machinery (no single-task global window; reference
    // computes it pandas-side on a 50k sample, stats.py:283-310).
    "q51_spearman" -> ((s, d) => {
      // NOT Tables.parallelized: spearman consumes the frame three
      // times (two rank passes + the join), and an up-front repartition
      // re-shuffles the whole fact per consumer — measured 2.0 -> 5.3 s
      // at sf0.1. The column-pruned direct scans are cheaper.
      val rho = graft.operators.GlobalRanks.spearman(
        Tables.load(s, d, "lineitem"), "l_quantity", "l_extendedprice")
      s.sql(s"SELECT CAST(round($rho, 6) AS DOUBLE) AS spearman")
    })
  )

  val oracles: Map[String, String] = Map(
    "q35_profile_hist" ->
      s"""WITH mm AS (SELECT min(l_quantity) AS lo, max(l_quantity) AS hi FROM lineitem)
         |SELECT least($Bins - 1,
         |         CAST(floor((l_quantity - lo) / ((hi - lo) / $Bins)) AS INTEGER)) AS bucket,
         |  count(*) AS cnt,
         |  round(min(l_quantity),6) AS bin_min, round(max(l_quantity),6) AS bin_max
         |FROM lineitem CROSS JOIN mm
         |GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q36_profile_nulls_ndv" ->
      """SELECT count(*) AS n_rows,
        | CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_event_type,
        | count(DISTINCT event_type) AS ndv_event_type,
        | count(DISTINCT user_id) AS ndv_user,
        | round(min(value),6) AS min_value, round(max(value),6) AS max_value
        |FROM events""".stripMargin,
    "q37_profile_corr_pairs" ->
      """SELECT round(corr(l_quantity, l_extendedprice),6) AS c_qty_price,
        | round(corr(l_quantity, l_discount),6) AS c_qty_disc,
        | round(corr(l_extendedprice, l_discount),6) AS c_price_disc
        |FROM lineitem""".stripMargin,
    "q51_spearman" ->
      """WITH r AS (
        |  SELECT
        |    rank() OVER (ORDER BY l_quantity)
        |      + (count(*) OVER (PARTITION BY l_quantity) - 1)/2.0 AS r1,
        |    rank() OVER (ORDER BY l_extendedprice)
        |      + (count(*) OVER (PARTITION BY l_extendedprice) - 1)/2.0 AS r2
        |  FROM lineitem)
        |SELECT CAST(round(corr(r1, r2), 6) AS DOUBLE) AS spearman FROM r""".stripMargin
  )
}
