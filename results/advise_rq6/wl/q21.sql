WITH fl AS (
  SELECT l_orderkey, l_suppkey, l_shipdate
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'),
sup AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS smax,
    collect_list(l_shipdate) AS sds
  FROM fl GROUP BY l_orderkey, l_suppkey),
rnk AS (
  SELECT l_orderkey, l_suppkey, smax, sds,
    row_number() OVER (PARTITION BY l_orderkey
      ORDER BY smax DESC, l_suppkey) AS rn,
    lead(smax) OVER (PARTITION BY l_orderkey
      ORDER BY smax DESC, l_suppkey) AS m2
  FROM sup),
winners AS (
  SELECT l_orderkey, l_suppkey,
    size(filter(sds, d -> d > m2)) AS cnt
  FROM rnk
  WHERE rn = 1 AND m2 IS NOT NULL AND m2 < smax)
SELECT s_name, CAST(sum(cnt) AS BIGINT) AS numwait
FROM winners
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_5'
GROUP BY s_name ORDER BY numwait DESC, s_name
