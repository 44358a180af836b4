SELECT md5(text) AS fingerprint,
       min(doc_id) AS keep_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY md5(text)
