package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** TPC-H stream queries (J2) adapted to the driver schema, executed the
  * way the reference executes everything: register temp views, then
  * `spark.sql(text)` (reference: lakehouse_op/tpch_all_runner.py:143-169,
  * run_queries.py:628). Catalyst supplies the whole operator zoo —
  * multi-way joins, semi/anti joins, IN subqueries, scalar subqueries,
  * CASE, LIKE — with AQE choosing broadcast vs shuffle joins at runtime
  * from observed sizes, which is the 100 TB-safe default.
  *
  * The SQL is dialect-shared: the exact same text runs on DuckDB as the
  * oracle (only rounding/aliasing conventions applied).
  *
  * Money sums accumulate in DECIMAL(18,4): double sums are
  * summation-order-dependent, and Spark's parallel partial aggregation
  * vs DuckDB's serial sum flipped the last rounded digit in round 2
  * (q43_tpch10 hash mismatch). Casting each product to decimal before
  * the sum is exact and order-independent in both engines; the result
  * is cast back to double so the output schema is unchanged.
  */
object TpchQueries {

  private def sql(text: String): (SparkSession, String) => DataFrame =
    (s, d) => { Tables.registerAll(s, d); s.sql(text) }

  /** Order-independent money sum, rounded to 2dp as a double. */
  private def moneySum(expr: String): String =
    s"round(CAST(sum(CAST($expr AS DECIMAL(18,4))) AS DOUBLE), 2)"

  // Q3 — shipping-priority revenue of BUILDING customers.
  private val q3 =
    s"""SELECT l_orderkey, o_orderdate,
      |  ${moneySum("l_extendedprice * (1 - l_discount)")} AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // Q5 — local-supplier volume per ASIA nation.
  private val q5 =
    s"""SELECT n_name,
      |  ${moneySum("l_extendedprice * (1 - l_discount)")} AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // Q6 — forecast revenue change (pure scan-filter-agg).
  private val q6 =
    s"""SELECT ${moneySum("l_extendedprice * l_discount")} AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin

  // Q10 — returned-item reporting: top customers by lost revenue.
  private val q10 =
    s"""SELECT c_custkey, c_name, n_name, round(c_acctbal, 2) AS acctbal,
      |  ${moneySum("l_extendedprice * (1 - l_discount)")} AS revenue
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, n_name, c_acctbal
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // Q14 — promotion revenue share (CASE + LIKE over a join). Both sums
  // accumulate exactly in DECIMAL, then the ratio is one deterministic
  // double division on each engine.
  private val q14 =
    """SELECT round(100.0
      |    * CAST(sum(CAST(CASE WHEN p_type LIKE 'PROMO%'
      |        THEN l_extendedprice * (1 - l_discount) ELSE 0 END
      |      AS DECIMAL(18,4))) AS DOUBLE)
      |  / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |      AS DECIMAL(18,4))) AS DOUBLE), 6) AS promo_revenue
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin

  // Q18 — large-volume customers (IN over a grouped HAVING subquery).
  private val q18 =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
      |  round(o_totalprice, 2) AS totalprice,
      |  round(sum(l_quantity), 2) AS sum_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (
      |    SELECT l_orderkey FROM lineitem
      |    GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  // Q22 — global sales opportunity (scalar subquery + NOT EXISTS),
  // adapted: nation key stands in for the phone country code. The avg
  // threshold is sum/count over DECIMAL so boundary rows can't flip
  // between engines on float-sum ordering.
  private val q22 =
    s"""SELECT c_nationkey, count(*) AS numcust,
      |  ${moneySum("c_acctbal")} AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4)))
      |                     AS DOUBLE) / count(*)
      |                   FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  private val texts = Map(
    "q40_tpch3" -> q3, "q41_tpch5" -> q5, "q42_tpch6" -> q6,
    "q43_tpch10" -> q10, "q44_tpch14" -> q14, "q45_tpch18" -> q18,
    "q46_tpch22" -> q22)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    texts.map { case (k, v) => k -> sql(v) }

  /** The oracle runs the identical text — the SQL is dialect-shared. */
  val oracles: Map[String, String] = texts
}
