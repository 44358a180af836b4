WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), pos_sh AS (
    -- positional 3-grams: one row per starting token position
    SELECT doc_id, pos,
           toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
    FROM (SELECT doc_id, toks,
                 unnest(generate_series(1, len(toks) - 2)) AS pos
          FROM toks)
    WHERE len(toks) >= 3
), df AS (
    -- cross-doc document frequency over DISTINCT (doc, shingle)
    SELECT shingle, count(*) AS df
    FROM (SELECT DISTINCT doc_id, shingle FROM pos_sh)
    GROUP BY shingle
), dup_pos AS (
    SELECT p.doc_id, p.pos
    FROM pos_sh p
    WHERE p.shingle IN (SELECT shingle FROM df WHERE df >= 2)
), runs AS (
    -- islands: pos - row_number() is constant within a consecutive run
    SELECT doc_id,
           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
    FROM dup_pos
), run_lens AS (
    SELECT doc_id, grp, count(*) AS run_len
    FROM runs GROUP BY doc_id, grp
)
SELECT doc_id,
       CAST(sum(run_len) AS BIGINT) AS dup_positions,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(max(run_len) + 2 AS BIGINT) AS longest_span_tokens
FROM run_lens
GROUP BY doc_id
