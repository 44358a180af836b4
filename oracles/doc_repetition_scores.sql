WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS toks
    FROM documents
), g AS (
    SELECT doc_id, toks,
           list_transform(generate_series(1, len(toks) - 2),
                          i -> array_to_string(toks[i:i+2], ' ')
           ) AS ngrams
    FROM tok WHERE len(toks) >= 3
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       floor((1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
              / len(toks)) * 1000000.0 + 0.5) / 1000000.0
           AS dup_word_frac,
       floor((1.0 - CAST(len(list_distinct(ngrams)) AS DOUBLE)
              / len(ngrams)) * 1000000.0 + 0.5) / 1000000.0
           AS dup_3gram_frac
FROM g
