SELECT doc_id, lang, source, bucket FROM (
    SELECT doc_id, lang, source,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
    FROM documents)
WHERE bucket < (CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 30
                ELSE 20 END)
