SELECT o_orderpriority,
       floor((quantile_cont(o_totalprice, 0.5)) * 1000000.0 + 0.5) / 1000000.0 AS p50,
       floor((quantile_cont(o_totalprice, 0.9)) * 1000000.0 + 0.5) / 1000000.0 AS p90,
       count(*) AS n
FROM orders GROUP BY o_orderpriority
