WITH d AS (
    SELECT lang,
           CAST(len(string_split(text, ' ')) AS BIGINT)
               AS n_tokens,
           greatest(CAST(len(string_split(text, ' ')) AS BIGINT)
                    - 128, 0) AS lost
    FROM documents
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN lost > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_truncated,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(lost) AS BIGINT) AS tokens_lost,
       floor((CAST(sum(lost) AS DOUBLE) / sum(n_tokens))
             * 1000000.0 + 0.5) / 1000000.0 AS lost_frac
FROM d GROUP BY lang
