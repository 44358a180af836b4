SELECT split, lang, count(*) AS n_docs FROM (
    SELECT lang,
           CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT lang,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
          FROM documents))
GROUP BY 1, 2 ORDER BY 1, 2
