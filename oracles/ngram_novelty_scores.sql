WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS MATERIALIZED (
    SELECT DISTINCT doc_id,
           toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
    FROM (SELECT doc_id, toks,
                 unnest(generate_series(1, len(toks) - 2)) AS pos
          FROM toks)
), uniq AS MATERIALIZED (
    SELECT shingle
    FROM (SELECT shingle, count(*) AS df FROM sh GROUP BY 1)
    WHERE df = 1
), sizes AS (
    SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1
), hits AS (
    SELECT doc_id, count(*) AS n_novel FROM sh
    WHERE shingle IN (SELECT shingle FROM uniq) GROUP BY 1
)
SELECT s.doc_id, s.n_shingles,
       coalesce(h.n_novel, 0) AS n_novel,
       CAST(floor(coalesce(h.n_novel, 0) / s.n_shingles
                  * 1000000.0 + 0.5) / 1000000.0 AS DOUBLE)
           AS novelty_frac
FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id
