WITH tok AS (
    -- identical quality recipe to the doc_quality_scores oracle
    SELECT doc_id,
           count(*) AS n_tokens,
           floor((CAST(sum(CASE WHEN word IN ('the','a','is','what','it','and','of','to','in')
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS stopword_ratio,
           floor((count(DISTINCT word) * 1.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS distinct_ratio
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents)
    GROUP BY doc_id
), q AS (
    SELECT d.doc_id, d.source,
           floor((least(t.n_tokens / 100.0, 1.0) * 0.4
                 + t.distinct_ratio * 0.4
                 + (1 - t.stopword_ratio) * 0.2) * 1000000.0 + 0.5) / 1000000.0 AS quality_score
    FROM documents d JOIN tok t ON d.doc_id = t.doc_id
), ranked AS (
    SELECT doc_id, source, quality_score,
           -- unique ordering via the doc_id tiebreak -> exact integer
           -- ratio (rank-1)/(n-1), engine-identical
           floor(percent_rank() OVER (
               PARTITION BY source ORDER BY quality_score, doc_id
           ) * 1000000.0 + 0.5) / 1000000.0 AS pct_rank,
           count(*) OVER (PARTITION BY source) AS n_source
    FROM q
)
-- a single-document source is kept: percent_rank of a 1-row partition
-- is 0.0, so a bare >= 0.5 cut would drop the smallest sources
SELECT doc_id, source, quality_score, pct_rank,
       (pct_rank >= 0.5 OR n_source = 1) AS keep_top_half
FROM ranked
