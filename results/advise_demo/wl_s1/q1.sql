SELECT sum(l_orderkey) FROM tbl WHERE l_quantity BETWEEN 24 AND 25 AND l_extendedprice BETWEEN 30000 AND 32000;
