SELECT c_custkey, c_name, CAST(100 - 10 AS INTEGER) AS score
FROM customer ORDER BY score, c_custkey
