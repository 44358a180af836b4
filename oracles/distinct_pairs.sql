SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
