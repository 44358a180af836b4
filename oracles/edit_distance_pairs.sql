WITH d AS (
    SELECT doc_id,
           substring(text, 1, 16) AS blk,
           substring(text, 1, 64) AS head
    FROM documents
), ok AS MATERIALIZED (
    SELECT blk FROM d GROUP BY blk
    HAVING count(*) BETWEEN 2 AND 64
), blocked AS MATERIALIZED (
    SELECT d.doc_id, d.blk, d.head FROM d JOIN ok USING (blk)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist
FROM blocked a JOIN blocked b
  ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.head, b.head) <= 24
