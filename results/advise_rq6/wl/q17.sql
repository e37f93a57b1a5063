SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
    AS DOUBLE) / 7.0, 6) AS avg_yearly
FROM (
  SELECT l_extendedprice, l_quantity,
    avg(l_quantity) OVER (PARTITION BY l_partkey) AS aq
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#23')
WHERE l_quantity < 0.5 * aq
