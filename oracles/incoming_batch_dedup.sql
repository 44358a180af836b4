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
), inc AS (
    SELECT doc_id FROM documents WHERE source = 'src0'
), exact_hit AS (
    SELECT i.doc_id FROM documents i
    WHERE i.source = 'src0'
      AND md5(i.text) IN (SELECT md5(text) FROM documents
                          WHERE source <> 'src0')
), near_hit AS (
    SELECT DISTINCT bi.doc_id
    FROM bands bi
    JOIN bands bc ON bi.band = bc.band AND bi.sig = bc.sig
    WHERE bi.doc_id IN (SELECT doc_id FROM inc)
      AND bc.doc_id NOT IN (SELECT doc_id FROM inc)
)
SELECT i.doc_id,
       CAST(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END
            AS BIGINT) AS is_exact_dup,
       CAST(CASE WHEN n.doc_id IS NOT NULL THEN 1 ELSE 0 END
            AS BIGINT) AS is_near_dup
FROM inc i
LEFT JOIN exact_hit e ON i.doc_id = e.doc_id
LEFT JOIN near_hit n ON i.doc_id = n.doc_id
