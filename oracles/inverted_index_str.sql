SELECT word,
       array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS doc_ids,
       count(DISTINCT doc_id) AS df
FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
) WHERE word <> '' GROUP BY word
