WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS (
    SELECT DISTINCT doc_id,
           toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
    FROM (SELECT doc_id, toks,
                 unnest(generate_series(1, len(toks) - 2)) AS pos
          FROM toks)
), thr AS (
    SELECT greatest(5, (count(*) + 99) // 100) AS thr
    FROM documents
), boiler AS (
    SELECT shingle
    FROM (SELECT shingle, count(*) AS df FROM sh GROUP BY 1), thr
    WHERE df >= thr
), sizes AS (
    SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1
), hits AS (
    SELECT doc_id, count(*) AS n_boiler FROM sh
    WHERE shingle IN (SELECT shingle FROM boiler) GROUP BY 1
)
SELECT s.doc_id, s.n_shingles,
       coalesce(h.n_boiler, 0) AS n_boiler,
       CAST(floor(coalesce(h.n_boiler, 0) / s.n_shingles
                  * 1000000.0 + 0.5) / 1000000.0 AS DOUBLE)
           AS coverage
FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id
