SELECT l_linestatus,
  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
      OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
    AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
      AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
    AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate > o_orderdate
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus ORDER BY l_linestatus
