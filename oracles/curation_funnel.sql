WITH toksl AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), bl AS (
    SELECT doc_id,
           CASE WHEN 20 * len(list_filter(toks,
                x -> x IN ('slow','dup','big'))) < len(toks)
           THEN 1 ELSE 0 END AS keep_flag
    FROM toksl
), tok AS (
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
                 + (1 - stopword_ratio) * 0.2) * 1000000.0 + 0.5)
               / 1000000.0 AS quality_score
    FROM tok
), reps AS (
    SELECT min(doc_id) AS doc_id FROM documents
    GROUP BY md5(text)
), sh AS (
    SELECT DISTINCT doc_id,
           toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
    FROM (SELECT doc_id, toks,
                 unnest(generate_series(1, len(toks) - 2)) AS pos
          FROM toksl)
), seeds AS (SELECT unnest(generate_series(0, 11)) AS seed),
mh AS (
    SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS mh
    FROM sh CROSS JOIN seeds GROUP BY doc_id, seed
), bands AS (
    SELECT doc_id, seed // 3 AS band,
           md5(string_agg(mh, '' ORDER BY seed)) AS sig
    FROM mh GROUP BY doc_id, seed // 3
), droppedd AS (
    SELECT DISTINCT b.doc_id
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.sig = b.sig
         AND a.doc_id < b.doc_id
), flags AS (
    SELECT d.doc_id,
           (bl.keep_flag = 1) AS s2,
           (q.quality_score >= 0.5) AS qq,
           (d.doc_id IN (SELECT doc_id FROM reps)) AS r,
           (d.doc_id NOT IN (SELECT doc_id FROM droppedd)) AS nd
    FROM documents d
    JOIN bl ON d.doc_id = bl.doc_id
    JOIN q ON d.doc_id = q.doc_id
), agg AS (
    SELECT count(*) AS n1,
           sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS n2,
           sum(CASE WHEN s2 AND qq THEN 1 ELSE 0 END) AS n3,
           sum(CASE WHEN s2 AND qq AND r THEN 1 ELSE 0 END) AS n4,
           sum(CASE WHEN s2 AND qq AND r AND nd THEN 1 ELSE 0 END) AS n5
    FROM flags
), stages AS (
    SELECT '1_total' AS stage, n1 AS n_docs, n1 AS total FROM agg
    UNION ALL SELECT '2_blocklist', n2, n1 FROM agg
    UNION ALL SELECT '3_quality', n3, n1 FROM agg
    UNION ALL SELECT '4_exact', n4, n1 FROM agg
    UNION ALL SELECT '5_neardup', n5, n1 FROM agg
)
SELECT stage, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(floor(n_docs / total * 1000000.0 + 0.5) / 1000000.0
            AS DOUBLE) AS pct_of_total
FROM stages
