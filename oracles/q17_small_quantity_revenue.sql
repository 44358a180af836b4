SELECT floor((CAST(sum(CAST(floor((l_extendedprice) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / 7.0) * 10000.0 + 0.5) / 10000.0 AS avg_yearly
FROM (
    SELECT l_extendedprice, l_quantity,
           avg(l_quantity) OVER (PARTITION BY p_partkey) AS avg_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#12'
)
WHERE l_quantity < 0.2 * avg_qty
