-- TPC-H Q15 stream: view setup, measured select, teardown
CREATE OR REPLACE TEMPORARY VIEW revenue0 AS
SELECT l_suppkey AS supplier_no,
  sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
GROUP BY l_suppkey
