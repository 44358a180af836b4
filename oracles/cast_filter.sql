SELECT CAST(c_custkey AS VARCHAR) AS id, c_name FROM customer
WHERE CAST(CAST(c_custkey AS VARCHAR) AS INTEGER) > 100
