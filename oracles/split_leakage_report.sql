WITH fp AS (
    -- one row per content fingerprint with its per-split doc counts
    -- (same md5(doc_id) hash-bucket assignment as dataset_splits)
    SELECT md5(text) AS fingerprint,
           CAST(sum(CASE WHEN b < 80 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_train,
           CAST(sum(CASE WHEN b >= 80 AND b < 90 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_val,
           CAST(sum(CASE WHEN b >= 90 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_test
    FROM (SELECT text,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                     % 100 AS b
          FROM documents)
    GROUP BY 1
)
SELECT 'train' AS split_a, 'val' AS split_b,
       CAST(COALESCE(sum(CASE WHEN n_train > 0 AND n_val > 0
                              THEN 1 END), 0) AS BIGINT)
           AS n_shared_fingerprints,
       CAST(COALESCE(sum(CASE WHEN n_train > 0 AND n_val > 0
                              THEN n_train END), 0) AS BIGINT)
           AS n_leaked_docs_a,
       CAST(COALESCE(sum(CASE WHEN n_train > 0 AND n_val > 0
                              THEN n_val END), 0) AS BIGINT)
           AS n_leaked_docs_b
FROM fp
UNION ALL
SELECT 'train', 'test',
       CAST(COALESCE(sum(CASE WHEN n_train > 0 AND n_test > 0
                              THEN 1 END), 0) AS BIGINT),
       CAST(COALESCE(sum(CASE WHEN n_train > 0 AND n_test > 0
                              THEN n_train END), 0) AS BIGINT),
       CAST(COALESCE(sum(CASE WHEN n_train > 0 AND n_test > 0
                              THEN n_test END), 0) AS BIGINT)
FROM fp
UNION ALL
SELECT 'val', 'test',
       CAST(COALESCE(sum(CASE WHEN n_val > 0 AND n_test > 0
                              THEN 1 END), 0) AS BIGINT),
       CAST(COALESCE(sum(CASE WHEN n_val > 0 AND n_test > 0
                              THEN n_val END), 0) AS BIGINT),
       CAST(COALESCE(sum(CASE WHEN n_val > 0 AND n_test > 0
                              THEN n_test END), 0) AS BIGINT)
FROM fp
