SELECT c_custkey, c_name,
       CASE WHEN c_custkey IN (
           SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
       ) THEN 1 ELSE 0 END AS has_urgent
FROM customer
