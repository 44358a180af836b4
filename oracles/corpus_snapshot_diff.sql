WITH v1 AS (SELECT doc_id, md5(text) AS fp_old FROM documents),
v2 AS (
    SELECT doc_id,
           md5(CASE WHEN doc_id % 23 = 0 THEN text || ' [rev2]'
                    ELSE text END) AS fp_new
    FROM documents WHERE doc_id % 37 <> 0
    UNION ALL
    SELECT doc_id + 1000000000 AS doc_id,
           md5(text || ' [new]') AS fp_new
    FROM documents WHERE doc_id % 41 = 0
), j AS (
    SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
           CASE WHEN v1.doc_id IS NULL THEN 'added'
                WHEN v2.doc_id IS NULL THEN 'removed'
                WHEN fp_old <> fp_new THEN 'changed' END
               AS status,
           fp_old, fp_new
    FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
)
SELECT * FROM j WHERE status IS NOT NULL
