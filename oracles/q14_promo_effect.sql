SELECT floor((100.0 * CAST(sum(CAST(floor((CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0
    / (CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0)) * 1000000.0 + 0.5) / 1000000.0 AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
