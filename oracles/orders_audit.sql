SELECT count(*) AS n_rows,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct_keys,
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_dup_keys,
       CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_price,
       CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative_price,
       min(o_orderdate) AS min_orderdate,
       max(o_orderdate) AS max_orderdate
FROM orders
