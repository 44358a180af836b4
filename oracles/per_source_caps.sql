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
), r AS (
    SELECT d.doc_id, d.source, q.quality_score,
           row_number() OVER (PARTITION BY d.source
                              ORDER BY q.quality_score DESC,
                                       d.doc_id) AS "rank"
    FROM documents d JOIN q USING (doc_id)
)
SELECT doc_id, source, quality_score, "rank"
FROM r WHERE "rank" <= 10
