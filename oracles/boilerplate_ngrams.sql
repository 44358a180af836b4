WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS (
    SELECT DISTINCT doc_id,
           toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
    FROM (SELECT doc_id, toks,
                 unnest(generate_series(1, len(toks) - 2)) AS pos
          FROM toks)
), thr AS (
    -- ceil(1% of corpus) with a floor of 5, pure integers
    SELECT greatest(5, (count(*) + 99) // 100) AS thr
    FROM documents
), dfq AS (
    SELECT shingle, count(*) AS df FROM sh GROUP BY 1
)
SELECT shingle, df FROM dfq, thr WHERE df >= thr
