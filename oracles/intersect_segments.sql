SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 1000
INTERSECT
SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
