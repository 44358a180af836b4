SELECT id, name, CAST(100 - 10 AS INTEGER) AS score FROM (
    SELECT c_custkey AS id, c_name AS name FROM customer WHERE c_acctbal > 18
    EXCEPT
    SELECT DISTINCT c_custkey AS id, c_name AS name FROM customer
    WHERE c_mktsegment = 'BUILDING'
) WHERE CAST(id AS INTEGER) > 100 ORDER BY score, id
