SELECT l_returnflag, l_linestatus,
       floor((CAST(sum(CAST(floor((l_quantity) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 100.0 + 0.5) / 100.0 AS sum_qty,
       floor((CAST(sum(CAST(floor((l_extendedprice) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 100.0 + 0.5) / 100.0 AS sum_base_price,
       floor((CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
       floor((CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 100.0 + 0.5) / 100.0 AS sum_charge,
       floor((CAST(sum(CAST(floor((l_quantity) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_qty,
       floor((CAST(sum(CAST(floor((l_extendedprice) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_price,
       floor((CAST(sum(CAST(floor((l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
