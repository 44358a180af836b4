WITH base AS (
    SELECT doc_id, text, length(text) AS n FROM documents
), resized AS (
    SELECT doc_id, n, text AS r FROM base WHERE n <= 64
    UNION ALL
    -- stride sampler: byte int(i * n/64) for i in 0..63;
    -- int() truncation == floor for non-negative doubles,
    -- and i * (n / 64.0) mirrors Python's op order exactly
    SELECT doc_id, n,
           string_agg(substring(text,
               CAST(floor(i * (n / CAST(64 AS DOUBLE)))
                    AS INT) + 1, 1), '' ORDER BY i) AS r
    FROM (SELECT doc_id, text, n,
                 unnest(generate_series(0, 63)) AS i
          FROM base WHERE n > 64)
    GROUP BY doc_id, n
)
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       CAST(n AS BIGINT) AS orig_bytes,
       CAST(length(r) AS BIGINT) AS n_bytes_resized,
       md5(r) AS resize_md5
FROM resized
