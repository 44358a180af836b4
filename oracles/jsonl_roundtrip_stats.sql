-- JSONL roundtrip: the aggregate computed straight off the parquet must
-- equal what the engine computes from the written-then-reread JSON Lines
-- (lossless by construction: integer/string columns only; the checksum
-- flips if any text byte is mangled by JSON escaping/decoding).
SELECT source,
       count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS sum_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT)
           AS text_checksum
FROM documents
WHERE lang IN ('en', 'de')
GROUP BY source
