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
), caps AS (
    -- quantile_cont shares linear interpolation with Spark percentile()
    -- over the already-grid-rounded scores (order_price_quantiles recipe)
    SELECT source,
           floor(quantile_cont(quality_score, 0.5) * 1000000.0 + 0.5) / 1000000.0 AS src_p50
    FROM q
    GROUP BY source
)
SELECT q.doc_id, q.source, q.quality_score, c.src_p50,
       q.quality_score >= c.src_p50 AS keep
FROM q JOIN caps c ON q.source = c.source
