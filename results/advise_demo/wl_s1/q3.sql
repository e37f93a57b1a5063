SELECT sum(l_orderkey) FROM tbl WHERE l_quantity BETWEEN 40 AND 41 AND l_extendedprice BETWEEN 10000 AND 12000;
