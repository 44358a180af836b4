SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       floor((CAST(sum(CAST(floor((CASE WHEN n1.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0
             / (CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0)) * 1000000.0 + 0.5) / 1000000.0
           AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region ON n2.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_year ORDER BY o_year
