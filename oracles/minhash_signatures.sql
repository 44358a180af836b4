WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS (
    SELECT DISTINCT doc_id,
           toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
    FROM (SELECT doc_id, toks,
                 unnest(generate_series(1, len(toks) - 2)) AS pos
          FROM toks)
), seeds AS (SELECT unnest(generate_series(0, 11)) AS seed)
SELECT doc_id, CAST(seed AS INTEGER) AS seed,
       min(md5(seed || ':' || shingle)) AS mh
FROM sh CROSS JOIN seeds GROUP BY doc_id, seed
