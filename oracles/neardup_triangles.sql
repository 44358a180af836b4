WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS (
    SELECT DISTINCT doc_id,
           toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
    FROM (SELECT doc_id, toks,
                 unnest(generate_series(1, len(toks) - 2)) AS pos
          FROM toks)
), seeds AS (SELECT unnest(generate_series(0, 11)) AS seed),
mh AS (
    SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS mh
    FROM sh CROSS JOIN seeds GROUP BY doc_id, seed
), bands AS (
    SELECT doc_id, seed // 3 AS band,
           md5(string_agg(mh, '' ORDER BY seed)) AS sig
    FROM mh GROUP BY doc_id, seed // 3
), edges AS (
    SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.sig = b.sig
         AND a.doc_id < b.doc_id
), tri AS (
    SELECT e1.a AS a, e1.b AS b, e2.b AS c
    FROM edges e1
    JOIN edges e2 ON e2.a = e1.b
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
), corners AS (
    SELECT unnest([a, b, c]) AS doc_id FROM tri
), pn AS (
    SELECT doc_id, count(*) AS n_triangles
    FROM corners GROUP BY 1
)
SELECT d.doc_id, coalesce(pn.n_triangles, 0) AS n_triangles
FROM documents d LEFT JOIN pn ON d.doc_id = pn.doc_id
