SELECT n_name, count(*) AS n_customers,
       floor((CAST(sum(CAST(floor((c_acctbal) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 10000.0 + 0.5) / 10000.0 AS total_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
