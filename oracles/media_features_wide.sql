WITH bytes AS (
    SELECT doc_id, length(text) AS n,
           ascii(substring(text, pos, 1)) AS byte,
           (pos - 1) % 8 AS k
    FROM (SELECT doc_id, text,
                 unnest(generate_series(1, length(text))) AS pos
          FROM documents)
), acc AS (
    SELECT doc_id, n, k, sum(byte) AS s FROM bytes GROUP BY 1, 2, 3
), wide AS (
    SELECT doc_id, CAST(n AS BIGINT) AS n_bytes, floor((coalesce(max(CASE WHEN k = 0 THEN s END), 0) * 1.0 / greatest(n, 1)) * 1000000.0 + 0.5) / 1000000.0 AS f0, floor((coalesce(max(CASE WHEN k = 1 THEN s END), 0) * 1.0 / greatest(n, 1)) * 1000000.0 + 0.5) / 1000000.0 AS f1, floor((coalesce(max(CASE WHEN k = 2 THEN s END), 0) * 1.0 / greatest(n, 1)) * 1000000.0 + 0.5) / 1000000.0 AS f2, floor((coalesce(max(CASE WHEN k = 3 THEN s END), 0) * 1.0 / greatest(n, 1)) * 1000000.0 + 0.5) / 1000000.0 AS f3, floor((coalesce(max(CASE WHEN k = 4 THEN s END), 0) * 1.0 / greatest(n, 1)) * 1000000.0 + 0.5) / 1000000.0 AS f4, floor((coalesce(max(CASE WHEN k = 5 THEN s END), 0) * 1.0 / greatest(n, 1)) * 1000000.0 + 0.5) / 1000000.0 AS f5, floor((coalesce(max(CASE WHEN k = 6 THEN s END), 0) * 1.0 / greatest(n, 1)) * 1000000.0 + 0.5) / 1000000.0 AS f6, floor((coalesce(max(CASE WHEN k = 7 THEN s END), 0) * 1.0 / greatest(n, 1)) * 1000000.0 + 0.5) / 1000000.0 AS f7
    FROM acc GROUP BY doc_id, n
)
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       n_bytes, f0, f1, f2, f3, f4, f5, f6, f7,
       floor(sqrt(f0 * f0 + f1 * f1 + f2 * f2 + f3 * f3 + f4 * f4 + f5 * f5 + f6 * f6 + f7 * f7) * 1000000.0 + 0.5) / 1000000.0 AS feature_norm
FROM wide
