SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE c_name LIKE 'Customer#00000001%'
ORDER BY c_name DESC
