SELECT doc_id,
       md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
       length(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS norm_len
FROM documents
