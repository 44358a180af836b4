WITH v AS (
    SELECT l_partkey, CAST(sum(CAST(floor((l_extendedprice) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_4'
    GROUP BY l_partkey
)
SELECT l_partkey, floor((value) * 10000.0 + 0.5) / 10000.0 AS value
FROM v WHERE value > 0.002 * (SELECT CAST(sum(CAST(floor((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 FROM v)
ORDER BY value DESC, l_partkey
