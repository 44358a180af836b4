SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+')) AS n_pieces,
       len(list_distinct(string_split(text, ' '))) AS n_types,
       floor((length(text) * 1.0 / len(string_split(text, ' '))) * 1000000.0 + 0.5) / 1000000.0 AS chars_per_token
FROM documents
