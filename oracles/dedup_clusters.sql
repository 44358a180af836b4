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
), edges AS (
    SELECT doc_a, doc_b FROM inter
    JOIN sizes x ON doc_a = x.doc_id
    JOIN sizes y ON doc_b = y.doc_id
    WHERE floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5) / 1000000.0 >= 0.1
), bidir AS (
    SELECT doc_a AS s, doc_b AS d FROM edges
    UNION SELECT doc_b, doc_a FROM edges
), walk(doc, reach) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT w.doc, b.d FROM walk w JOIN bidir b ON w.reach = b.s
)
SELECT doc AS doc_id, min(reach) AS cluster_id
FROM walk GROUP BY doc
