WITH per_src AS (
    SELECT source,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT)
               AS n_tokens
    FROM documents GROUP BY source
), m AS (
    SELECT source, n_tokens,
           CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))
                      * 1000000.0 + 0.5) AS BIGINT) AS mass
    FROM per_src
), a AS (
    SELECT source, n_tokens,
           CAST(CAST(1000000 AS BIGINT) * mass
                // (SELECT sum(mass) FROM m)
                AS BIGINT) AS target_tokens
    FROM m
)
SELECT source, n_tokens, target_tokens,
       floor((CAST(target_tokens AS DOUBLE) / n_tokens)
             * 1000000.0 + 0.5) / 1000000.0 AS epoch_factor
FROM a
