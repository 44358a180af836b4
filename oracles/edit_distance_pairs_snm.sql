WITH d AS (
    SELECT doc_id, substring(text, 1, 64) AS head,
           reverse(substring(text, 1, 64)) AS skey
    FROM documents
), r AS MATERIALIZED (
    SELECT doc_id, head, skey,
           substring(skey, 1, 2) AS blk,
           row_number() OVER (PARTITION BY substring(skey, 1, 2)
                              ORDER BY skey, doc_id) AS rn
    FROM d
)
SELECT least(a.doc_id, b.doc_id) AS doc_a,
       greatest(a.doc_id, b.doc_id) AS doc_b,
       CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist
FROM r a JOIN r b
  ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 8
WHERE levenshtein(a.head, b.head) <= 24
