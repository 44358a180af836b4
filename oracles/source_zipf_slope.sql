WITH counts AS (
    SELECT source, word, count(*) AS c
    FROM (SELECT source, unnest(string_split(text, ' ')) AS word
          FROM documents)
    WHERE word <> ''
    GROUP BY source, word
), ranked AS (
    SELECT source, c,
           row_number() OVER (
               PARTITION BY source ORDER BY c DESC, word
           ) AS rk
    FROM counts
), terms AS (
    -- each per-word regression term micro-quantized to a LONG BEFORE
    -- the (order-dependent) sum, mirroring the Spark expressions
    SELECT source,
           CAST(floor((ln(rk)) * 1000000.0 + 0.5) AS BIGINT) AS x,
           CAST(floor((ln(c)) * 1000000.0 + 0.5) AS BIGINT) AS y,
           CAST(floor((ln(rk) * ln(rk)) * 1000000.0 + 0.5) AS BIGINT) AS xx,
           CAST(floor((ln(rk) * ln(c)) * 1000000.0 + 0.5) AS BIGINT) AS xy
    FROM ranked
), agg AS (
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_vocab,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(xx) AS BIGINT) AS sxx,
           CAST(sum(xy) AS BIGINT) AS sxy
    FROM terms
    GROUP BY source
)
SELECT source, n_vocab,
       -- every micro-sum divides through an explicit DOUBLE: a bare
       -- fractional literal is DECIMAL in DuckDB and BIGINT/DECIMAL
       -- stays exact-decimal, off the IEEE quotient Spark computes
       floor((CASE WHEN n_vocab * (CAST(sxx AS DOUBLE) / CAST(1000000.0 AS DOUBLE))
                        - (CAST(sx AS DOUBLE) / CAST(1000000.0 AS DOUBLE))
                          * (CAST(sx AS DOUBLE) / CAST(1000000.0 AS DOUBLE)) = 0.0
                   THEN 0.0
                   ELSE (n_vocab * (CAST(sxy AS DOUBLE) / CAST(1000000.0 AS DOUBLE))
                         - (CAST(sx AS DOUBLE) / CAST(1000000.0 AS DOUBLE))
                           * (CAST(sy AS DOUBLE) / CAST(1000000.0 AS DOUBLE)))
                        / (n_vocab * (CAST(sxx AS DOUBLE) / CAST(1000000.0 AS DOUBLE))
                           - (CAST(sx AS DOUBLE) / CAST(1000000.0 AS DOUBLE))
                             * (CAST(sx AS DOUBLE) / CAST(1000000.0 AS DOUBLE))) END)
             * 1000000.0 + 0.5) / 1000000.0 AS zipf_slope
FROM agg
