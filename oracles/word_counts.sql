SELECT word, count(*) AS cnt FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
) WHERE word <> '' GROUP BY word
