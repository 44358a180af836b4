WITH big AS (
    SELECT l_orderkey, floor((CAST(sum(CAST(floor((l_quantity) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 100.0 + 0.5) / 100.0 AS sum_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING floor((CAST(sum(CAST(floor((l_quantity) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 100.0 + 0.5) / 100.0 > 180
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       sum_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
