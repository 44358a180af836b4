WITH per_src AS (
    SELECT source, count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT)
               AS n_tokens
    FROM documents GROUP BY source
), m AS (
    SELECT source, n_docs, n_tokens,
           CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0
                      + 0.5) AS BIGINT) AS mass
    FROM per_src
)
SELECT source, n_docs, n_tokens,
       floor((CAST(mass AS DOUBLE)
              / CAST((SELECT sum(mass) FROM m) AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS mix_weight
FROM m
