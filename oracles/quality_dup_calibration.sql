WITH tok AS (
    SELECT doc_id,
           count(*) AS n_tokens,
           floor((CAST(sum(CASE WHEN word IN ('the','a','is','what','it','and','of','to','in')
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS stopword_ratio,
           floor((count(DISTINCT word) * 1.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS distinct_ratio
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents)
    GROUP BY doc_id
), q AS (
    SELECT doc_id,
           floor((least(n_tokens / 100.0, 1.0) * 0.4
                 + distinct_ratio * 0.4
                 + (1 - stopword_ratio) * 0.2) * 1000000.0 + 0.5) / 1000000.0 AS quality_score
    FROM tok
), toks AS (
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
), pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
), dup AS (
    SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM pairs
        UNION ALL SELECT doc_b AS doc_id FROM pairs)
), b AS (
    SELECT least(CAST(floor(quality_score * 1000000.0 + 0.5)
                      AS BIGINT) // 100000, 9) AS band,
           CASE WHEN doc_id IN (SELECT doc_id FROM dup)
                THEN 1 ELSE 0 END AS is_dup,
           quality_score
    FROM q
)
SELECT band, count(*) AS n_docs,
       CAST(sum(is_dup) AS BIGINT) AS n_neardup,
       floor((sum(is_dup) * 1.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS dup_rate,
       floor(min(quality_score) * 1000000.0 + 0.5) / 1000000.0 AS min_quality,
       floor(max(quality_score) * 1000000.0 + 0.5) / 1000000.0 AS max_quality
FROM b GROUP BY band
