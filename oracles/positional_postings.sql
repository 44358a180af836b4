SELECT t[pos] AS word, doc_id, CAST(pos AS BIGINT) AS pos
FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS pos
      FROM (SELECT doc_id, string_split(text, ' ') AS t
            FROM documents))
WHERE t[pos] <> ''
