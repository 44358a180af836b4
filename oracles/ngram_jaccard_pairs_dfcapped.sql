WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS (
    SELECT DISTINCT doc_id,
           toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
    FROM (SELECT doc_id, toks,
                 unnest(generate_series(1, len(toks) - 2)) AS pos
          FROM toks)
), df AS (
    SELECT shingle, count(*) AS df FROM sh GROUP BY shingle
), rare AS (
    -- df cap: shingles in more than 8 docs (NGRAM_DF_CAP) never enter
    -- candidate generation
    SELECT sh.doc_id, sh.shingle
    FROM sh JOIN df USING (shingle)
    WHERE df.df <= 8
), cand AS (
    -- candidates: pairs sharing >= 1 RARE shingle
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM rare a JOIN rare b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
), sizes AS (
    SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
    -- exact verification over the FULL shingle sets, candidate-scoped
    SELECT c.doc_a, c.doc_b, count(*) AS c
    FROM cand c
    JOIN sh a ON a.doc_id = c.doc_a
    JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
FROM inter
JOIN sizes x ON doc_a = x.doc_id
JOIN sizes y ON doc_b = y.doc_id
WHERE floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5) / 1000000.0 >= 0.1
