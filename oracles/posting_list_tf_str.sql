SELECT word,
       string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id, tf) AS postings,
       CAST(sum(tf) AS BIGINT) AS total_tf
FROM (
    SELECT word, doc_id, count(*) AS tf FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ) WHERE word <> '' GROUP BY word, doc_id
) GROUP BY word
