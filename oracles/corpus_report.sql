WITH base AS (
    SELECT lang, source,
           CAST(len(string_split(text, ' ')) AS BIGINT)
               AS n_tokens,
           CAST(floor(CAST(len(list_distinct(
                    string_split(text, ' '))) AS DOUBLE)
                / len(string_split(text, ' '))
                * 1000000.0 + 0.5) AS BIGINT) AS ttr_micro,
           CASE WHEN len(string_split(text, ' ')) < 8
                THEN 1 ELSE 0 END AS is_short
    FROM documents
)
SELECT lang, source, count(*) AS n_docs,
       floor((CAST(sum(n_tokens) AS BIGINT) / count(*))
             * 1000000.0 + 0.5) / 1000000.0 AS mean_tokens,
       floor((CAST(sum(is_short) AS BIGINT) / count(*))
             * 1000000.0 + 0.5) / 1000000.0 AS short_doc_frac,
       floor((CAST(sum(ttr_micro) AS BIGINT) / count(*)
              / 1000000.0)
             * 1000000.0 + 0.5) / 1000000.0 AS mean_ttr
FROM base GROUP BY 1, 2
