SELECT c_nationkey, count(*) AS numcust,
       floor((CAST(sum(CAST(floor((c_acctbal) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 10000.0 + 0.5) / 10000.0 AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(sum(CAST(floor((c_acctbal) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*) FROM customer
                   WHERE c_acctbal > 0)
  AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey ORDER BY c_nationkey
