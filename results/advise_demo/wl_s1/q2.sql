SELECT sum(l_orderkey) FROM tbl WHERE l_quantity BETWEEN 10 AND 11 AND l_extendedprice BETWEEN 50000 AND 52000;
