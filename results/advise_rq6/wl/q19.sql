SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey AND (
    (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      AND l_quantity BETWEEN 1 AND 11)
    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
      AND l_quantity BETWEEN 10 AND 20)
    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
      AND l_quantity BETWEEN 20 AND 30))
