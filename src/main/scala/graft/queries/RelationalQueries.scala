package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The single-table + join query surface of the reference, re-expressed
  * with the DataFrame API so Catalyst handles pushdown/pruning/join
  * selection (reference executes everything via `spark.sql`:
  * lakehouse_op/run_queries.py:628; query shapes from
  * workload_spec/spec_tpch_Q series, spec_amazon_Q series,
  * workloads/demo (q1-q4 .sql), wlg/templates/sql.py).
  *
  * Conventions shared with the DuckDB oracles:
  *  - every aggregate/computed column is aliased identically on both
  *    sides (the driver's compare sorts columns by name);
  *  - every result has a deterministic total ORDER BY (unique tie-break);
  *  - double aggregates are rounded: big sums → 2 dp, means/ratios → 6 dp
  *    (absorbs partial-aggregation float reordering vs DuckDB's serial sum);
  *  - integer sums are CAST to BIGINT in the oracle (DuckDB sums int64 →
  *    HUGEINT, which would otherwise change the schema).
  */
object RelationalQueries {

  private def T(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  // Predicate constants used by the range/point queries (chosen to hit
  // moderate selectivity on the synthetic data; dates are TPC-H-like).
  private val shipLo = "1995-01-01 00:00:00"
  private val shipHi = "1995-12-31 23:59:59"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2/A6 group-by + multi-agg (demo q3_group_by, TPC-H Q1 shape).
    // Price sums accumulate in exact DECIMAL (order-independent): at
    // sf0.1 each group sums ~150k doubles at magnitude ~6e9, where the
    // partial-sum reordering error (~7e-4) is the same order as the 5e-3
    // rounding-boundary margin — the construction that made q38b a
    // coin-flip gate. Raw 2-dp columns cast exactly; the product is
    // computed in decimal on both engines (same as TpchQueries.discPrice).
    "q1_agg" -> ((s, d) => {
      val decPrice = col("l_extendedprice").cast("decimal(12,2)")
      val decDisc = col("l_discount").cast("decimal(12,2)")
      T(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(decPrice), 2).cast("double").as("sum_base_price"),
          round(sum(decPrice * (lit(1).cast("decimal(12,2)") - decDisc)), 2)
            .cast("double").as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // P2 1-D range predicate (demo q2_date_range): count + sum in band.
    // DECIMAL accumulation for the same order-independence reason as q1.
    "q2_date_range" -> ((s, d) => {
      T(s, d, "lineitem")
        .filter(col("l_shipdate").between(lit(shipLo).cast("timestamp"), lit(shipHi).cast("timestamp")))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("l_extendedprice").cast("decimal(12,2)")), 2)
            .cast("double").as("sum_price"))
    }),

    // P4/P5/P8 point + IN predicates (demo q1_filter, spec_tpch_Q3/Q4)
    "q3_point_in" -> ((s, d) => {
      T(s, d, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_linestatus").isin("O", "F"))
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_linestatus"))
    }),

    // P7 disjunction of ranges (spec_amazon_Q3 shape)
    "q4_or_range" -> ((s, d) => {
      T(s, d, "lineitem")
        .filter((col("l_quantity") <= 5.0 || col("l_quantity") >= 45.0) &&
          col("l_discount").between(0.02, 0.08))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
    }),

    // A6 ORDER BY DESC + LIMIT top-k (demo q4_order_limit)
    "q5_topk" -> ((s, d) => {
      T(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_shipdate"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    }),

    // J1 fact→dim equi join with dim filter (wlg Template D); dim is
    // broadcast (part is tiny relative to lineitem at every SF).
    "q6_join_dim" -> ((s, d) => {
      val li = T(s, d, "lineitem")
      val p = T(s, d, "part").filter(col("p_size").between(10, 30))
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("p_brand"))
    }),

    // J2-style multi-way join + agg (TPC-H Q5 shape, 5 tables)
    "q7_multijoin" -> ((s, d) => {
      val c = T(s, d, "customer"); val o = T(s, d, "orders")
      val n = T(s, d, "nation"); val r = T(s, d, "region")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // J2 semi join (TPC-H Q4 EXISTS shape)
    "q8_semijoin" -> ((s, d) => {
      val o = T(s, d, "orders")
      val big = T(s, d, "lineitem").filter(col("l_quantity") >= 48.0).select(col("l_orderkey"))
      o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus"))
    }),

    // J2 anti join (TPC-H Q22 NOT EXISTS shape)
    "q9_antijoin" -> ((s, d) => {
      val c = T(s, d, "customer"); val o = T(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("cnt"), round(sum(col("c_acctbal")), 2).as("sum_bal"))
    }),

    // A5 HAVING on count (spec_tpch_Q6 shape)
    "q10_having" -> ((s, d) => {
      T(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("sum_price"))
        .filter(col("cnt") >= 12)
        .orderBy(col("o_custkey"))
    }),

    // A7/A8 distinct cardinalities
    "q11_distinct" -> ((s, d) => {
      T(s, d, "lineitem")
        .agg(countDistinct(col("l_partkey")).as("ndv_part"),
          countDistinct(col("l_suppkey")).as("ndv_supp"),
          count(lit(1)).as("cnt"))
    }),

    // A4 conditional aggregation (spec_amazon_Q4 CASE WHEN shape)
    "q12_case_agg" -> ((s, d) => {
      T(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
          count(lit(1)).as("cnt"))
        .orderBy(col("o_orderpriority"))
    }),

    // A3 group-by over expression (spec_tpch_Q7 year() shape)
    "q13_year_agg" -> ((s, d) => {
      T(s, d, "lineitem")
        .groupBy(year(col("l_shipdate")).as("ship_year"))
        .agg(count(lit(1)).as("cnt"), round(avg(col("l_quantity")), 6).as("avg_qty"))
        .orderBy(col("ship_year"))
    }),

    // J2 correlated/scalar subquery (TPC-H Q17 shape)
    "q14_scalar_subquery" -> ((s, d) => {
      val li = T(s, d, "lineitem")
      val avgP = li.agg(avg(col("l_extendedprice")).as("ap"))
      li.join(broadcast(avgP))
        .filter(col("l_extendedprice") > col("ap") * 1.5)
        .agg(count(lit(1)).as("cnt"),
          round(min(col("l_extendedprice")), 2).as("min_price"),
          round(max(col("l_extendedprice")), 2).as("max_price"))
    }),

    // Per-supplier argmax. Expressed as max(struct(...)) instead of a
    // row_number window: a hash aggregate with map-side partial combine —
    // no per-partition sort, no full-row shuffle — which is the plan that
    // survives 100 TB (the window variant shuffles and sorts every row).
    // Struct comparison is lexicographic, so negating the tie-break keys
    // yields "highest price, then lowest orderkey/linenumber".
    "q15_window_rank" -> ((s, d) => {
      T(s, d, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(max(struct(col("l_extendedprice"), (-col("l_orderkey")).as("nok"),
          (-col("l_linenumber")).as("nln"))).as("m"))
        .select(col("l_suppkey"), (-col("m.nok")).cast("long").as("l_orderkey"),
          (-col("m.nln")).cast("int").as("l_linenumber"),
          round(col("m.l_extendedprice"), 2).as("top_price"))
        .orderBy(col("l_suppkey"))
    }),

    // W1 ntile batch split (build_tpch_update_batches.py:62-63), made
    // deterministic by ordering on the key instead of rand(seed).
    // Computed with the distributed rank machinery (range partition +
    // broadcast offsets) instead of `ntile() OVER (ORDER BY ...)`, whose
    // unpartitioned window funnels every row through one task; on the
    // unique o_orderkey the bucket assignment is identical.
    "q16_ntile" -> ((s, d) => {
      // DECIMAL accumulation: a double sum is summation-order-dependent
      // (flipped q43's last rounded digit in round 2); decimal is exact
      // and order-independent on both engines.
      graft.operators.GlobalRanks.ntileByRange(T(s, d, "orders"), "o_orderkey", 8)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2)
            .as("sum_price"))
        .orderBy(col("bucket"))
    }),

    // A10 quantiles — exact interpolated percentile (profiler F2/A10;
    // reference uses np.quantile on a sample, we compute exact).
    "q17_quantile" -> ((s, d) => {
      T(s, d, "lineitem").agg(
        round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 6).as("p75"),
        round(expr("percentile(l_extendedprice, 0.95)"), 6).as("price_p95"))
    }),

    // A14 correlation + dispersion (profiler correlations)
    "q18_corr" -> ((s, d) => {
      T(s, d, "lineitem").agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
        round(avg(col("l_quantity")), 6).as("mean_qty"))
    }),

    // A3 date_trunc bucketing on the events table (spec_amazon_Q2 shape)
    "q19_events_hourly" -> ((s, d) => {
      T(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("hour_ts"), col("event_type"))
    }),

    // Hierarchical aggregation: ROLLUP over (returnflag, linestatus) —
    // subtotals + grand total in one pass (Spark expands grouping sets
    // with a single shuffle; no reference counterpart, free via Catalyst).
    "q47_rollup" -> ((s, d) => {
      T(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // CUBE: all 2^n grouping sets in one pass (same Expand-based plan
    // family as rollup — Spark replicates each input row once per
    // grouping set before ONE hash agg, so it stays a single shuffle).
    "q90_cube" -> ((s, d) => {
      T(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // Explicit GROUPING SETS (an arbitrary set list, not the rollup/cube
    // lattice): per-returnflag totals, per-linestatus totals, and the
    // grand total — rows distinguished by their null pattern, no
    // engine-specific grouping_id bit order in the gate. Same
    // single-Expand single-shuffle plan family.
    "q94_grouping_sets" -> ((s, d) => {
      T(s, d, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // Rank-distribution windows: percent_rank + cume_dist per language
    // over doc length, emitting only the top tail (cume_dist <= 0.05).
    // Partitioned windows (per-lang), never a global sort.
    "q95_percent_rank" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      T(s, d, "documents")
        .select(col("lang"), col("doc_id"), col("n_chars"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .filter(col("cume") <= 0.05)
        .orderBy(col("lang"), col("doc_id"))
    }),

    // Session assignment in pure SQL-window form: a session starts where
    // the gap to the previous event of the same user exceeds 30 min;
    // session id = running count of session starts (lag + cumulative sum
    // window chain, exact microsecond arithmetic, event_id tie-break).
    // Output: session-length histogram.
    "q48_sessions" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val us = unix_micros(col("ts"))
      val newSession = when(
        us - lag(us, 1).over(byUser) > 1800L * 1000000L, 1L).otherwise(lit(0L))
      val withId = T(s, d, "events")
        .withColumn("new_s", coalesce(newSession, lit(0L)))
        .withColumn("session_idx", sum(col("new_s")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      withId
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy(col("n_events"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_events"))
    }),

    // A5/A6 amazon-Q5 shape: HAVING COUNT BETWEEN + ORDER BY agg DESC
    // LIMIT over the events table (spec_amazon_Q5.yaml:14-16).
    "q50_having_topk" -> ((s, d) => {
      T(s, d, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
        .filter(col("n_events").between(5, 500))
        .orderBy(col("sum_value").desc, col("user_id"))
        .limit(100)
    }),

    // A9 top-k frequent values (profiler top-k, K small here)
    "q20_topk_freq" -> ((s, d) => {
      T(s, d, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("lang"))
        .limit(10)
    }),

    // Point-in-time feature attachment: every click gets the user's
    // latest at-or-before view's value via the AsOfJoin operator (one
    // key-partitioned union+window pass — no pair blow-up), then
    // per-user rollup. DECIMAL accumulation keeps the double sum
    // order-independent for the hash gate.
    "q68_asof_enrich" -> ((s, d) => {
      val ev = T(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").as("view_event_id"), col("value").as("view_value"))
      graft.operators.AsOfJoin
        .asOf(clicks, views, Seq("user_id"), "ts",
          valueCols = Seq("view_value"), tieBreak = "view_event_id")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_clicks"),
          count(col("view_value")).as("n_matched"),
          round(sum(col("view_value").cast("decimal(18,2)")).cast("double"), 2)
            .as("sum_view_value"))
        .orderBy(col("user_id"))
    }),

    // The as-of operator's OTHER semantics under the same hash gate:
    // forward direction (next view at-or-after each click) bounded by a
    // 1-hour tolerance — matches farther out are null-extended. Same
    // single union+window pass; the tolerance is one interval
    // comparison on the matched struct's timestamp.
    "q68b_asof_forward" -> ((s, d) => {
      val ev = T(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"),
          col("event_id").as("view_event_id"), col("value").as("view_value"))
      graft.operators.AsOfJoin
        .asOf(clicks, views, Seq("user_id"), "ts", "view_ts",
          valueCols = Seq("view_value"), tieBreak = "view_event_id",
          direction = "forward", tolerance = Some(expr("INTERVAL 1 HOUR")))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_clicks"),
          count(col("view_value")).as("n_matched"),
          round(sum(col("view_value").cast("decimal(18,2)")).cast("double"), 2)
            .as("sum_view_value"))
        .orderBy(col("user_id"))
    }),

    // Point-in-interval attribution via the binned RangeJoin: every
    // purchase opens a 1-hour window; count ALL clicks (any user)
    // landing inside it. No equality key exists, so vanilla Spark plans
    // BroadcastNestedLoopJoin — the bin bucketing restores a shuffled
    // equi-join (RangeJoinSuite asserts the plan). Epoch-micros longs
    // (exact), DECIMAL accumulation for the value sum, left join keeps
    // zero-click purchases.
    "q70_interval_join" -> ((s, d) => {
      val ev = T(s, d, "events")
      val hour = 3600L * 1000000L
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"),
          unix_micros(col("ts")).as("p_lo"))
        .withColumn("p_hi", col("p_lo") + hour)
      val clicks = ev.filter(col("event_type") === "click")
        .select(unix_micros(col("ts")).as("c_ts"), col("value").as("c_value"))
      // auto width: every window is exactly one hour, so the derived
      // median IS the hour — the auto path runs under the q70 hash gate
      val matched = graft.operators.RangeJoin
        .pointInIntervalAuto(clicks, "c_ts", purchases, "p_lo", "p_hi")
        .groupBy(col("purchase_id"))
        .agg(count(lit(1)).as("n_clicks"),
          round(sum(col("c_value").cast("decimal(18,2)")).cast("double"), 2)
            .as("click_value"))
      purchases.select(col("purchase_id"))
        .join(matched, Seq("purchase_id"), "left")
        .select(col("purchase_id"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          coalesce(col("click_value"), lit(0.0)).as("click_value"))
        .orderBy(col("purchase_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))),2) AS DOUBLE)
        |   AS sum_base_price,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |   * (1 - CAST(l_discount AS DECIMAL(12,2)))),2) AS DOUBLE)
        |   AS sum_disc_price,
        | round(avg(l_quantity),6) AS avg_qty,
        | round(avg(l_discount),6) AS avg_disc,
        | count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_date_range" ->
      s"""SELECT count(*) AS cnt,
         | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))),2) AS DOUBLE)
         |   AS sum_price
         |FROM lineitem
         |WHERE l_shipdate BETWEEN TIMESTAMP '$shipLo' AND TIMESTAMP '$shipHi'""".stripMargin,
    "q3_point_in" ->
      """SELECT l_linestatus, count(*) AS cnt, round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus IN ('O','F')
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q4_or_range" ->
      """SELECT count(*) AS cnt, round(sum(l_extendedprice*l_discount),2) AS revenue
        |FROM lineitem
        |WHERE (l_quantity <= 5.0 OR l_quantity >= 45.0)
        |  AND l_discount BETWEEN 0.02 AND 0.08""".stripMargin,
    "q5_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q6_join_dim" ->
      """SELECT p_brand, count(*) AS cnt,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size BETWEEN 10 AND 30
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q7_multijoin" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
        | round(sum(o_totalprice),2) AS sum_price
        |FROM customer
        | JOIN orders ON c_custkey = o_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q8_semijoin" ->
      """SELECT o_orderstatus, count(*) AS cnt FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48.0)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q9_antijoin" ->
      """SELECT count(*) AS cnt, round(sum(c_acctbal),2) AS sum_bal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q10_having" ->
      """SELECT o_custkey, count(*) AS cnt, round(sum(o_totalprice),2) AS sum_price
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 12
        |ORDER BY o_custkey""".stripMargin,
    "q11_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS ndv_part,
        | count(DISTINCT l_suppkey) AS ndv_supp, count(*) AS cnt
        |FROM lineitem""".stripMargin,
    "q12_case_agg" ->
      """SELECT o_orderpriority,
        | CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        | CAST(sum(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        | count(*) AS cnt
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q13_year_agg" ->
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year, count(*) AS cnt,
        | round(avg(l_quantity),6) AS avg_qty
        |FROM lineitem GROUP BY 1 ORDER BY ship_year""".stripMargin,
    "q14_scalar_subquery" ->
      """SELECT count(*) AS cnt, round(min(l_extendedprice),2) AS min_price,
        | round(max(l_extendedprice),2) AS max_price
        |FROM lineitem
        |WHERE l_extendedprice > (SELECT avg(l_extendedprice) FROM lineitem) * 1.5""".stripMargin,
    "q15_window_rank" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, round(l_extendedprice,2) AS top_price
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_suppkey
        |        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |      FROM lineitem) t
        |WHERE rn = 1 ORDER BY l_suppkey""".stripMargin,
    "q16_ntile" ->
      """SELECT bucket, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),2) AS sum_price
        |FROM (SELECT o_totalprice, ntile(8) OVER (ORDER BY o_orderkey) AS bucket
        |      FROM orders) t
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q17_quantile" ->
      """SELECT round(quantile_cont(l_quantity, 0.25),6) AS p25,
        | round(quantile_cont(l_quantity, 0.5),6) AS p50,
        | round(quantile_cont(l_quantity, 0.75),6) AS p75,
        | round(quantile_cont(l_extendedprice, 0.95),6) AS price_p95
        |FROM lineitem""".stripMargin,
    "q18_corr" ->
      """SELECT round(corr(l_quantity, l_extendedprice),6) AS corr_qty_price,
        | round(stddev_samp(l_quantity),6) AS sd_qty,
        | round(avg(l_quantity),6) AS mean_qty
        |FROM lineitem""".stripMargin,
    "q19_events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts, event_type,
        | count(*) AS cnt, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type""".stripMargin,
    "q20_topk_freq" ->
      """SELECT lang, count(*) AS cnt FROM documents
        |GROUP BY lang ORDER BY cnt DESC, lang LIMIT 10""".stripMargin,
    "q47_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        | round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q90_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        | round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q94_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        | round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q95_percent_rank" ->
      """SELECT lang, doc_id, n_chars, pct_rank, cume FROM (
        |  SELECT lang, doc_id, n_chars,
        |    round(percent_rank() OVER w, 6) AS pct_rank,
        |    round(cume_dist() OVER w, 6) AS cume
        |  FROM documents
        |  WINDOW w AS (PARTITION BY lang ORDER BY n_chars DESC, doc_id))
        |WHERE cume <= 0.05 ORDER BY lang, doc_id""".stripMargin,
    "q48_sessions" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |ids AS (
        |  SELECT user_id,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM marked),
        |per_session AS (
        |  SELECT user_id, session_idx, count(*) AS n_events
        |  FROM ids GROUP BY 1, 2)
        |SELECT CAST(n_events AS BIGINT) AS n_events, count(*) AS n_sessions
        |FROM per_session GROUP BY 1 ORDER BY n_events""".stripMargin,
    "q50_having_topk" ->
      """SELECT user_id, count(*) AS n_events, round(sum(value),2) AS sum_value
        |FROM events GROUP BY user_id
        |HAVING count(*) BETWEEN 5 AND 500
        |ORDER BY sum_value DESC, user_id LIMIT 100""".stripMargin,
    // as-of semantics spelled out portably (latest view at-or-before
    // each click, ties broken by event_id desc) — equivalent to DuckDB's
    // ASOF LEFT JOIN but with the tie-break pinned
    "q68_asof_enrich" ->
      """WITH c AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
        |v AS (
        |  SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'view'),
        |matched AS (
        |  SELECT c.user_id, c.event_id,
        |    (SELECT v.value FROM v
        |      WHERE v.user_id = c.user_id AND v.ts <= c.ts
        |      ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_value
        |  FROM c)
        |SELECT user_id, count(*) AS n_clicks, count(view_value) AS n_matched,
        |  round(CAST(sum(CAST(view_value AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS sum_view_value
        |FROM matched GROUP BY user_id ORDER BY user_id""".stripMargin,
    // forward as-of with tolerance: earliest view at-or-after each
    // click, no farther than one hour out, ties broken by event_id desc
    "q68b_asof_forward" ->
      """WITH c AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
        |v AS (
        |  SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'view'),
        |matched AS (
        |  SELECT c.user_id, c.event_id,
        |    (SELECT v.value FROM v
        |      WHERE v.user_id = c.user_id AND v.ts >= c.ts
        |        AND v.ts <= c.ts + INTERVAL 1 HOUR
        |      ORDER BY v.ts ASC, v.event_id DESC LIMIT 1) AS view_value
        |  FROM c)
        |SELECT user_id, count(*) AS n_clicks, count(view_value) AS n_matched,
        |  round(CAST(sum(CAST(view_value AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS sum_view_value
        |FROM matched GROUP BY user_id ORDER BY user_id""".stripMargin,
    // the oracle states the range join directly (DuckDB's IEJoin handles
    // it); epoch_us matches Spark's unix_micros on the same µs-truncated
    // timestamps
    "q70_interval_join" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, epoch_us(ts) AS t
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT epoch_us(ts) AS t, value FROM events WHERE event_type = 'click')
        |SELECT p.purchase_id, count(c.t) AS n_clicks,
        |  coalesce(round(CAST(sum(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE), 2),
        |    0.0) AS click_value
        |FROM p LEFT JOIN c ON c.t >= p.t AND c.t < p.t + 3600000000
        |GROUP BY p.purchase_id ORDER BY p.purchase_id""".stripMargin
  )
}
