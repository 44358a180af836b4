WITH ranked AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY doc_id) - 1 AS rnk
    FROM documents
), n AS (SELECT count(*) AS n_docs FROM documents),
fan AS (
    SELECT r.doc_id, r.rnk, i.neg_i
    FROM ranked r,
         (SELECT unnest(generate_series(0, 3)) AS neg_i) i
), picked AS (
    SELECT doc_id, neg_i,
           CASE WHEN h = rnk THEN (h + 1) % n.n_docs ELSE h END
               AS neg_rnk
    FROM (
        SELECT f.doc_id, f.rnk, f.neg_i,
               ('0x' || substr(md5(CAST(f.doc_id AS VARCHAR)
                    || ':' || CAST(f.neg_i AS VARCHAR)), 1, 8)
               )::BIGINT % n.n_docs AS h,
               n.n_docs
        FROM fan f CROSS JOIN n
    ) CROSS JOIN n
)
SELECT p.doc_id, p.neg_i, r.doc_id AS neg_doc_id
FROM picked p JOIN ranked r ON p.neg_rnk = r.rnk
