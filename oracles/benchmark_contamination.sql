WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS (
    SELECT DISTINCT doc_id,
           toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
    FROM (SELECT doc_id, toks,
                 unnest(generate_series(1, len(toks) - 2)) AS pos
          FROM toks)
), ev AS (
    SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
)
SELECT doc_id, count(*) AS n_shared_shingles
FROM sh JOIN ev USING (shingle)
WHERE doc_id % 97 <> 0
GROUP BY doc_id
