WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(toks,
            x -> x IN ('slow','dup','big'))) AS BIGINT) AS n_hits,
       md5(array_to_string(list_filter(toks,
            x -> NOT x IN ('slow','dup','big')), ' '))
           AS scrub_md5,
       CAST(CASE WHEN 20 * len(list_filter(toks,
                     x -> x IN ('slow','dup','big'))) < len(toks)
            THEN 1 ELSE 0 END AS BIGINT) AS keep_flag
FROM t
