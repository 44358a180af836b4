WITH r AS (
    SELECT o_orderpriority, o_totalprice,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS rn,
           count(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM orders
), terms AS (
    SELECT word, count(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ) WHERE word <> '' GROUP BY word
), tot AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM terms)
SELECT 'distinct_users' AS metric, event_type AS key,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_value,
       TRUE AS within_bound
FROM events GROUP BY event_type
UNION ALL
SELECT 'p50_price', o_orderpriority,
       CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT), TRUE
FROM r WHERE rn = CAST(floor((n - 1) * 0.5) AS BIGINT) + 1
UNION ALL
SELECT 'p99_price', o_orderpriority,
       CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT), TRUE
FROM r WHERE rn = CAST(floor((n - 1) * 0.99) AS BIGINT) + 1
UNION ALL
SELECT 'heavy_hitter', word, CAST(n AS BIGINT), TRUE
FROM terms CROSS JOIN tot WHERE n > big_n * 1.0 / 16
