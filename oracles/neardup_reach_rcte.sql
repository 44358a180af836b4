WITH RECURSIVE toks AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS (
    SELECT DISTINCT doc_id,
           toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
    FROM (SELECT doc_id, toks,
                 unnest(generate_series(1, len(toks) - 2)) AS pos
          FROM toks)
), sizes AS (
    SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
    FROM sh a JOIN sh b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
), ed AS MATERIALIZED (
    SELECT doc_a, doc_b FROM inter
    JOIN sizes x ON doc_a = x.doc_id
    JOIN sizes y ON doc_b = y.doc_id
    WHERE floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5)
          / 1000000.0 >= 0.1
), walk(src, dst, depth) AS (
    SELECT doc_a, doc_b, 1 FROM ed
    UNION ALL
    SELECT w.src, e.doc_b, w.depth + 1
    FROM walk w JOIN ed e ON w.dst = e.doc_a
    WHERE w.depth < 10
)
SELECT src AS doc_id,
       CAST(count(DISTINCT dst) AS BIGINT) AS n_reachable,
       CAST(max(depth) AS BIGINT) AS max_chain
FROM walk GROUP BY src
