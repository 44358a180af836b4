SELECT lang,
       count(*) AS n_docs,
       string_agg(DISTINCT source, ',' ORDER BY source)
           AS sources
FROM documents
GROUP BY lang
