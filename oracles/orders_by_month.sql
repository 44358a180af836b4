SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(month(o_orderdate) AS BIGINT) AS mo,
       count(*) AS n_orders,
       floor((CAST(sum(CAST(floor((o_totalprice) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 10000.0 + 0.5) / 10000.0 AS revenue
FROM orders GROUP BY 1, 2
