SELECT 'o_orderstatus' AS column_name,
       CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT o_orderstatus) AS n_distinct,
       min(CAST(o_orderstatus AS VARCHAR)) AS min_value,
       max(CAST(o_orderstatus AS VARCHAR)) AS max_value
FROM orders
UNION ALL
SELECT 'o_orderpriority',
       CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT o_orderpriority),
       min(CAST(o_orderpriority AS VARCHAR)),
       max(CAST(o_orderpriority AS VARCHAR))
FROM orders
UNION ALL
SELECT 'o_custkey',
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT o_custkey),
       min(CAST(o_custkey AS VARCHAR)),
       max(CAST(o_custkey AS VARCHAR))
FROM orders
