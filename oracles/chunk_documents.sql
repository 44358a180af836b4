WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), c AS (
    SELECT doc_id, toks,
           unnest(generate_series(0, (len(toks) - 1) // 32)) AS chunk_id
    FROM t
)
SELECT doc_id,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       array_to_string(
           toks[chunk_id * 32 + 1 : least((chunk_id + 1) * 32, len(toks))],
           ' ') AS chunk_text,
       CAST(least((chunk_id + 1) * 32, len(toks)) - chunk_id * 32
            AS BIGINT) AS n_tokens
FROM c
