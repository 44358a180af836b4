WITH pos AS (
    SELECT doc_id, text,
           unnest(generate_series(1, length(text) - 15)) AS p
    FROM documents WHERE length(text) >= 16
), h AS (
    SELECT doc_id, CAST((p - 1) // 8 AS BIGINT) AS block,
           ('0x' || substr(md5(substring(text, p, 16)), 1, 8))::BIGINT AS hv
    FROM pos
)
SELECT doc_id, block, min(hv) AS fp
FROM h GROUP BY 1, 2
