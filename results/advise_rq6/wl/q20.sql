SELECT s_suppkey, s_name
FROM supplier, nation
WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem, part
    WHERE l_partkey = p_partkey AND p_name LIKE 'red%'
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey
    HAVING sum(l_quantity) > 50)
  AND s_nationkey = n_nationkey AND n_name = 'NATION_4'
ORDER BY s_suppkey
