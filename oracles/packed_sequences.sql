WITH t AS (
    SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n
    FROM documents
), c AS (
    SELECT doc_id, source, n,
           sum(n) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum
    FROM t
)
SELECT doc_id, source, n AS n_tokens,
       CAST((cum - n) // 256 AS BIGINT) AS bin_id,
       CAST((cum - n) % 256 AS BIGINT) AS offset_in_bin
FROM c
