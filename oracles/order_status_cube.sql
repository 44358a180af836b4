SELECT o_orderstatus, o_orderpriority,
       count(*) AS n,
       floor((CAST(sum(CAST(floor((o_totalprice) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 10000.0 + 0.5) / 10000.0 AS total,
       CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS lvl
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
