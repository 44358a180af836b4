WITH pos AS (
    SELECT doc_id, text,
           unnest(generate_series(1, length(text) - 15)) AS p
    FROM documents WHERE length(text) >= 16
), h AS (
    SELECT doc_id, CAST((p - 1) // 8 AS BIGINT) AS block,
           ('0x' || substr(md5(substring(text, p, 16)), 1, 8))::BIGINT AS hv
    FROM pos
), fp AS MATERIALIZED (
    SELECT DISTINCT doc_id, fp FROM (
        SELECT doc_id, block, min(hv) AS fp
        FROM h GROUP BY 1, 2)
), rare AS MATERIALIZED (
    SELECT doc_id, fp FROM fp
    WHERE fp IN (
        SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 64)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       count(*) AS n_shared
FROM rare a JOIN rare b
  ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 3
