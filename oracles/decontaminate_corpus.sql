-- reuses the contamination_retrieval oracle's scoring chain,
-- rolled up per TRAIN doc with the strong-floor keep flag
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS (
    -- identical distinct 3-gram recipe to the benchmark_contamination
    -- oracle
    SELECT DISTINCT doc_id,
           toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
    FROM (SELECT doc_id, toks,
                 unnest(generate_series(1, len(toks) - 2)) AS pos
          FROM toks)
), ev AS (
    SELECT doc_id AS eval_doc_id, shingle FROM sh WHERE doc_id % 97 = 0
), tr AS (
    SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0
), n AS (
    SELECT count(*) AS n_train FROM documents WHERE doc_id % 97 <> 0
), hits AS (
    SELECT tr.doc_id, tr.shingle FROM tr
    WHERE tr.shingle IN (SELECT shingle FROM ev)
), dfp AS (
    -- (doc, shingle) rows are distinct, so count(*) = document
    -- frequency; the df cap (CONTAM_DF_CAP=16) drops boilerplate
    -- shingles before the pair expansion, mirroring the Spark probe
    SELECT shingle, count(*) AS df FROM hits GROUP BY shingle
    HAVING count(*) <= 16
), idf AS (
    -- Lucene-variant idf over TRAIN docs, grid-rounded then micro-quantized
    -- (float op order identical to the Spark expression; fractional
    -- literals meet a DOUBLE first so no DECIMAL arithmetic sneaks in)
    SELECT shingle,
           CAST(floor(floor(ln((CAST(n.n_train AS DOUBLE) - dfp.df + 0.5)
                               / (dfp.df + 0.5) + 1.0)
                            * 1000000.0 + 0.5) / 1000000.0
                      * 1000000.0 + 0.5) AS BIGINT) AS idf_micros
    FROM dfp CROSS JOIN n
), scored AS (
    -- the inner join with the CAPPED idf relation doubles as the
    -- hot-shingle anti-join: only rare shingles reach the aggregate
    SELECT ev.eval_doc_id, hits.doc_id,
           CAST(count(*) AS BIGINT) AS n_shared_shingles,
           CAST(sum(idf.idf_micros) AS BIGINT) AS score_micros
    FROM hits
    JOIN ev USING (shingle)
    JOIN idf USING (shingle)
    GROUP BY ev.eval_doc_id, hits.doc_id
)
, per_doc AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_eval_matches,
           CAST(max(score_micros) AS BIGINT) AS top_micros
    FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_eval_matches, 0) AS BIGINT) AS n_eval_matches,
       COALESCE(p.top_micros, 0) / 1000000.0 AS top_score,
       CAST(CASE WHEN COALESCE(p.top_micros, 0) >= 5000000
                 THEN 0 ELSE 1 END AS BIGINT) AS keep_flag
FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
LEFT JOIN per_doc p USING (doc_id)
