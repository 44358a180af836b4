WITH counts AS (
    SELECT source, word, count(*) AS c
    FROM (SELECT source, unnest(string_split(text, ' ')) AS word
          FROM documents)
    WHERE word <> ''
    GROUP BY source, word
), grp AS (
    -- tie groups: one row per (source, count value) with the group size
    SELECT source, c, count(*) AS m
    FROM counts
    GROUP BY source, c
), ranked AS (
    -- rank() semantics from a cumulative sum over the DISTINCT-count
    -- relation: every word with count c takes 1 + #(words with larger
    -- count) — the min of its row_number tie range
    SELECT source, c, m,
           CAST(COALESCE(sum(m) OVER (
               PARTITION BY source ORDER BY c DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) + 1 AS BIGINT) AS rk
    FROM grp
), terms AS (
    -- per-GROUP regression term micro-quantized to a LONG, multiplied
    -- by the exact integer group size BEFORE the (associative) sum,
    -- mirroring the Spark expressions
    SELECT source, m,
           m * CAST(floor((ln(rk)) * 1000000.0 + 0.5) AS BIGINT) AS x,
           m * CAST(floor((ln(c)) * 1000000.0 + 0.5) AS BIGINT) AS y,
           m * CAST(floor((ln(rk) * ln(rk)) * 1000000.0 + 0.5) AS BIGINT) AS xx,
           m * CAST(floor((ln(rk) * ln(c)) * 1000000.0 + 0.5) AS BIGINT) AS xy
    FROM ranked
), agg AS (
    SELECT source,
           CAST(sum(m) AS BIGINT) AS n_vocab,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(xx) AS BIGINT) AS sxx,
           CAST(sum(xy) AS BIGINT) AS sxy
    FROM terms
    GROUP BY source
)
SELECT source, n_vocab, n_groups,
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
