SELECT word, doc_id, count(*) AS tf FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
) WHERE word <> '' GROUP BY word, doc_id
