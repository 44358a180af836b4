-- PII canary-injection scrub: deterministic canaries per doc_id, the
-- three-pattern redaction chain, per-class counts + redacted-text md5 +
-- residual-clean boolean. Patterns are the RE2∩Java-identical subset
-- (geektime_bigdata_spark/operators/textstats.py PII_* constants).
WITH canaried AS (
  SELECT doc_id,
         'contact user' || CAST(doc_id AS VARCHAR) || '@example.com '
         || CASE WHEN doc_id % 3 = 0 THEN 'ph 555-010-1234 ' ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN 'ip 10.0.0.' || CAST(doc_id % 250 AS VARCHAR) || ' '
                 ELSE '' END
         || text AS text
  FROM documents
), redacted AS (
  SELECT doc_id,
         text,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g'),
             '\b[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}\b',
             '<PHONE>', 'g'),
           '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
           '<IP>', 'g') AS scrubbed
  FROM canaried
)
SELECT doc_id,
       CAST(len(regexp_extract_all(
         text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
         AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(
         text, '\b[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}\b'))
         AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(
         text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
         AS BIGINT) AS n_ips,
       md5(scrubbed) AS redacted_md5,
       (len(regexp_extract_all(
          scrubbed, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        + len(regexp_extract_all(
            scrubbed, '\b[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}\b'))
        + len(regexp_extract_all(
            scrubbed, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
       ) = 0 AS clean
FROM redacted
