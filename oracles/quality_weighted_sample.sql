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
                 + (1 - stopword_ratio) * 0.2) * 1000000.0 + 0.5)
               / 1000000.0 AS quality_score,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 1000000 AS u
    FROM tok
)
SELECT doc_id, quality_score, u FROM q
WHERE u < CAST(floor(quality_score * 1000000.0 + 0.5) AS BIGINT)
