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
  */
object TpchQueries {

  private def sql(text: String): (SparkSession, String) => DataFrame =
    (s, d) => { Tables.registerAll(s, d); s.sql(text) }

  // Q3 — shipping-priority revenue of BUILDING customers.
  private val q3 =
    """SELECT l_orderkey, o_orderdate,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // Q5 — local-supplier volume per ASIA nation.
  private val q5 =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
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
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin

  // Q10 — returned-item reporting: top customers by lost revenue.
  private val q10 =
    """SELECT c_custkey, c_name, n_name, round(c_acctbal, 2) AS acctbal,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, n_name, c_acctbal
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // Q14 — promotion revenue share (CASE + LIKE over a join).
  private val q14 =
    """SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
      |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
      |  / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
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
  // adapted: nation key stands in for the phone country code.
  private val q22 =
    """SELECT c_nationkey, count(*) AS numcust,
      |  round(sum(c_acctbal), 2) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
      |                   WHERE c_acctbal > 0.0)
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
