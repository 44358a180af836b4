WITH toksl AS (
    SELECT string_split(text, ' ') AS toks FROM documents
), staged AS MATERIALIZED (
    SELECT len(toks) AS n,
           len(list_filter(toks, t -> t IN ('slow','dup','big')))
               AS hits,
           len(list_distinct(toks)) AS n_types,
           len(list_filter(toks, w -> w IN
               ('the','a','is','what','it','and','of','to','in')))
               AS n_stop
    FROM toksl
), feats AS MATERIALIZED (
    SELECT CASE WHEN 20 * hits < n THEN 1 ELSE 0 END AS y,
           CAST(1 AS DOUBLE) AS x0,
           floor(least(n / CAST(100 AS DOUBLE), CAST(1 AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS x1,
           floor((CAST(n_types AS DOUBLE) / n) * 1e6 + 0.5) / 1e6 AS x2,
           floor((CAST(1 AS DOUBLE) - CAST(n_stop AS DOUBLE) / n)
                 * 1e6 + 0.5) / 1e6 AS x3
    FROM staged
), g0 AS MATERIALIZED (
    SELECT
        CAST(sum(CAST(floor((CAST(0.5 AS DOUBLE) - y) * x0 * 1e6 + 0.5)
                      AS BIGINT)) AS BIGINT) AS g0,
        CAST(sum(CAST(floor((CAST(0.5 AS DOUBLE) - y) * x1 * 1e6 + 0.5)
                      AS BIGINT)) AS BIGINT) AS g1,
        CAST(sum(CAST(floor((CAST(0.5 AS DOUBLE) - y) * x2 * 1e6 + 0.5)
                      AS BIGINT)) AS BIGINT) AS g2,
        CAST(sum(CAST(floor((CAST(0.5 AS DOUBLE) - y) * x3 * 1e6 + 0.5)
                      AS BIGINT)) AS BIGINT) AS g3,
        count(*) AS n_docs
    FROM feats
), w1 AS MATERIALIZED (
    SELECT
        CAST(floor(-(g0 / 1e6 / n_docs) * 1e6 + 0.5) AS BIGINT) AS w0,
        CAST(floor(-(g1 / 1e6 / n_docs) * 1e6 + 0.5) AS BIGINT) AS w1,
        CAST(floor(-(g2 / 1e6 / n_docs) * 1e6 + 0.5) AS BIGINT) AS w2,
        CAST(floor(-(g3 / 1e6 / n_docs) * 1e6 + 0.5) AS BIGINT) AS w3
    FROM g0
), scored AS MATERIALIZED (
    SELECT f.y, f.x0, f.x1, f.x2, f.x3,
           floor((CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE)
                  + exp(-(CAST((
                        CAST(floor((w.w0 / 1e6) * f.x0 * 1e6 + 0.5)
                             AS BIGINT)
                      + CAST(floor((w.w1 / 1e6) * f.x1 * 1e6 + 0.5)
                             AS BIGINT)
                      + CAST(floor((w.w2 / 1e6) * f.x2 * 1e6 + 0.5)
                             AS BIGINT)
                      + CAST(floor((w.w3 / 1e6) * f.x3 * 1e6 + 0.5)
                             AS BIGINT)
                    ) AS DOUBLE) / 1e6))))
                 * 1e6 + 0.5) / 1e6 AS p
    FROM feats f CROSS JOIN w1 w
), g1s AS MATERIALIZED (
    SELECT
        CAST(sum(CAST(floor((p - y) * x0 * 1e6 + 0.5) AS BIGINT))
             AS BIGINT) AS g0,
        CAST(sum(CAST(floor((p - y) * x1 * 1e6 + 0.5) AS BIGINT))
             AS BIGINT) AS g1,
        CAST(sum(CAST(floor((p - y) * x2 * 1e6 + 0.5) AS BIGINT))
             AS BIGINT) AS g2,
        CAST(sum(CAST(floor((p - y) * x3 * 1e6 + 0.5) AS BIGINT))
             AS BIGINT) AS g3
    FROM scored
)
SELECT CAST(0 AS BIGINT) AS feature, w1.w0 AS w_micros,
       g1s.g0 AS grad_micros FROM w1, g1s
UNION ALL
SELECT CAST(1 AS BIGINT), w1.w1, g1s.g1 FROM w1, g1s
UNION ALL
SELECT CAST(2 AS BIGINT), w1.w2, g1s.g2 FROM w1, g1s
UNION ALL
SELECT CAST(3 AS BIGINT), w1.w3, g1s.g3 FROM w1, g1s
