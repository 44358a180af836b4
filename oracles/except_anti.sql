SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 0
EXCEPT
SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
