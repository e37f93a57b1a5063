SELECT o_year,
  round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
        ELSE 0 END) AS DOUBLE)
    / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
    CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS volume,
    n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer,
       nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
      AND TIMESTAMP '1997-12-31 00:00:00'
    AND p_type = 'ECONOMY') AS all_nations
GROUP BY o_year ORDER BY o_year
