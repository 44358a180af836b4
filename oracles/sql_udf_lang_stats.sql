SELECT lang,
       count(*) AS n_docs,
       floor((CAST(sum(n_chars) AS DOUBLE) / count(*))
             * 1000000.0 + 0.5) / 1000000.0 AS avg_chars,
       floor((CAST(sum(length(text)) AS DOUBLE) / count(*))
             * 1000000.0 + 0.5) / 1000000.0 AS avg_text_len
FROM documents
GROUP BY lang
