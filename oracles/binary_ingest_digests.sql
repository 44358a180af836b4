-- Binary export -> binaryFile ingest: the oracle rebuilds the
-- deterministic ASCII payload (repeat(md5(doc_id), 4)) straight off
-- the documents table and computes the same per-lang aggregates the
-- engine computes AFTER pushing the bytes through a real
-- export-to-files -> binaryFile-ingest loop (one file per doc,
-- doc_id recovered from the filename, decoy file pruned by the
-- listing glob). The filesystem trip is exactly what the
-- differential isolates. Payload is ASCII hex ON PURPOSE: DuckDB
-- 1.0's md5 takes VARCHAR only, and pure-ASCII bytes hash
-- identically through Spark's md5(binary). The binding checksum
-- hashes doc_id || ':' || md5(payload) so a payload landing under
-- the wrong filename flips it even when the plain content sum
-- cannot see the swap.
WITH sel AS (
    SELECT doc_id, lang,
           repeat(md5(CAST(doc_id AS VARCHAR)), 4) AS payload
    FROM documents
    WHERE doc_id % 10 = 0
)
SELECT lang,
       count(*) AS n_files,
       CAST(sum(length(payload)) AS BIGINT) AS sum_bytes,
       CAST(sum(('0x' || substr(md5(payload), 1, 8))::BIGINT)
            AS BIGINT) AS content_checksum,
       CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                                 || md5(payload)), 1, 8))::BIGINT)
            AS BIGINT) AS binding_checksum
FROM sel
GROUP BY lang
