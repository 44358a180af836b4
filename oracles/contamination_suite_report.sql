WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS (
    -- identical distinct 3-gram recipe to the contamination_retrieval
    -- oracle
    SELECT DISTINCT doc_id,
           toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
    FROM (SELECT doc_id, toks,
                 unnest(generate_series(1, len(toks) - 2)) AS pos
          FROM toks)
), suite_ids AS (
    SELECT CAST(unnest([97, 89, 83]) AS BIGINT) AS suite
), suite_sizes AS (
    -- per-suite eval/train doc counts (the Spark side computes these
    -- in one driver-row aggregate)
    SELECT s.suite,
           CAST(sum(CASE WHEN d.doc_id % s.suite = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_eval_docs,
           CAST(sum(CASE WHEN d.doc_id % s.suite <> 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_train_docs
    FROM suite_ids s CROSS JOIN documents d
    GROUP BY s.suite
), ev AS (
    SELECT s.suite, sh.doc_id AS eval_doc_id, sh.shingle
    FROM sh JOIN suite_ids s ON sh.doc_id % s.suite = 0
), ev_sh AS (
    SELECT DISTINCT suite, shingle FROM ev
), hits AS (
    -- one corpus probe fanned out by suite membership; a doc is train
    -- for every suite it does NOT belong to
    SELECT es.suite, sh.doc_id, sh.shingle
    FROM sh JOIN ev_sh es ON sh.shingle = es.shingle
    WHERE sh.doc_id % es.suite <> 0
), dfp AS (
    -- per-suite train df over probe survivors; the df cap
    -- (CONTAM_DF_CAP=16) drops boilerplate before the eval fan-out
    SELECT suite, shingle, count(*) AS df FROM hits
    GROUP BY suite, shingle
    HAVING count(*) <= 16
), idf AS (
    -- Lucene-variant idf over that suite's train count, grid-rounded
    -- then micro-quantized (same float op order as Spark)
    SELECT dfp.suite, dfp.shingle,
           CAST(floor(floor(ln((CAST(ss.n_train_docs AS DOUBLE) - dfp.df + 0.5)
                               / (dfp.df + 0.5) + 1.0)
                            * 1000000.0 + 0.5) / 1000000.0
                      * 1000000.0 + 0.5) AS BIGINT) AS idf_micros
    FROM dfp JOIN suite_sizes ss ON dfp.suite = ss.suite
), scored AS (
    SELECT hits.suite, ev.eval_doc_id, hits.doc_id,
           CAST(sum(idf.idf_micros) AS BIGINT) AS score_micros
    FROM hits
    JOIN ev  ON hits.suite = ev.suite  AND hits.shingle = ev.shingle
    JOIN idf ON hits.suite = idf.suite AND hits.shingle = idf.shingle
    GROUP BY hits.suite, ev.eval_doc_id, hits.doc_id
), top1 AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (
            PARTITION BY suite, eval_doc_id
            ORDER BY score_micros DESC, doc_id
        ) AS rk FROM scored
    ) WHERE rk = 1
), per_suite AS (
    SELECT suite,
           CAST(count(*) AS BIGINT) AS n_matched_eval,
           CAST(sum(CASE WHEN score_micros >= 5000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_strong_eval,
           CAST(sum(score_micros) AS BIGINT) AS sum_top1_micros
    FROM top1 GROUP BY suite
)
SELECT ss.suite, ss.n_eval_docs, ss.n_train_docs,
       CAST(COALESCE(ps.n_matched_eval, 0) AS BIGINT) AS n_matched_eval,
       CAST(COALESCE(ps.n_strong_eval, 0) AS BIGINT) AS n_strong_eval,
       CAST(COALESCE(ps.sum_top1_micros, 0) AS BIGINT) AS sum_top1_micros,
       -- integer-ratio rates on the 1e-6 grid; BIGINT / BIGINT is IEEE
       -- double division in DuckDB exactly as long / long is in Spark
       CASE WHEN ss.n_eval_docs = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE floor((COALESCE(ps.n_matched_eval, 0) / ss.n_eval_docs)
                       * 1000000.0 + 0.5) / 1000000.0 END AS matched_rate,
       CASE WHEN ss.n_eval_docs = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE floor((COALESCE(ps.n_strong_eval, 0) / ss.n_eval_docs)
                       * 1000000.0 + 0.5) / 1000000.0 END AS strong_rate
FROM suite_sizes ss LEFT JOIN per_suite ps ON ss.suite = ps.suite
