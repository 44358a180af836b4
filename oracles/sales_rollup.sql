SELECT l_returnflag, l_linestatus,
       count(*) AS n,
       floor((CAST(sum(CAST(floor((l_quantity) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 100.0 + 0.5) / 100.0 AS sum_qty,
       CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS lvl
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
