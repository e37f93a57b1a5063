WITH oq AS (
  SELECT l_orderkey, sum(l_quantity) AS sq
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
  round(o_totalprice, 2) AS totalprice,
  round(sq, 2) AS sum_qty
FROM oq JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY totalprice DESC, o_orderkey LIMIT 20
