SELECT c_custkey, c_mktsegment, c_acctbal,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       floor((percent_rank() OVER w) * 1000000.0 + 0.5) / 1000000.0 AS pct_rank
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY c_acctbal DESC, c_custkey)
