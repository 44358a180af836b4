SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       floor((CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 10000.0 + 0.5) / 10000.0
           AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2 ORDER BY 1, 2 DESC
