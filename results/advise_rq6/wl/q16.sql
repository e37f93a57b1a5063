SELECT p_brand, p_type, p_size,
  count(DISTINCT l_suppkey) AS supplier_cnt
FROM part, lineitem
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 4, 7, 10, 14, 19, 25, 28, 32, 36)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
