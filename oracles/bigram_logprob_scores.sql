WITH toksl AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), t -> t <> '') AS ft
    FROM documents
), prs AS MATERIALIZED (
    SELECT doc_id, ft[i] AS w1, ft[i + 1] AS w2
    FROM (SELECT doc_id, ft,
                 unnest(generate_series(1, len(ft) - 1)) AS i
          FROM toksl WHERE len(ft) >= 2)
), big AS MATERIALIZED (
    SELECT w1, w2, count(*) AS cnt FROM prs GROUP BY w1, w2
), ctx AS MATERIALIZED (
    SELECT w1, count(*) AS ctx FROM prs GROUP BY w1
)
SELECT doc_id,
       count(*) AS n_bigrams,
       floor(((CAST(sum(CAST(floor(ln(CAST(cnt AS DOUBLE) / ctx)
                                   * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1e6) / count(*)) * 1e6 + 0.5) / 1e6 AS avg_cond_logprob
FROM prs JOIN big USING (w1, w2) JOIN ctx USING (w1)
GROUP BY doc_id
