SELECT md5(array_to_string(list_sort(string_split(text, ' ')),
                           ' ')) AS bow_fingerprint,
       min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY 1
