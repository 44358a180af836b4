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
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
