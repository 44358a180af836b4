WITH t AS (
    SELECT CAST(floor(log2(CAST(len(string_split(text, ' '))
                     AS DOUBLE))) AS BIGINT) AS bucket,
           CAST(len(string_split(text, ' ')) AS BIGINT)
               AS n_tokens
    FROM documents
    WHERE len(string_split(text, ' ')) >= 1
)
SELECT bucket,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       max(n_tokens) AS max_tokens,
       CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT)
           AS padding_waste
FROM t GROUP BY 1
