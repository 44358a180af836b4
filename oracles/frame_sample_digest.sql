WITH frames AS (
    SELECT doc_id, text,
           unnest(generate_series(0,
               CAST(ceil(length(text) / CAST(64 AS DOUBLE))
                    AS INT) - 1)) AS frame_no
    FROM documents
)
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       CAST(frame_no AS BIGINT) AS frame_no,
       CAST(length(substring(text, frame_no * 64 + 1, 64))
            AS BIGINT) AS chunk_bytes,
       md5(substring(text, frame_no * 64 + 1, 64)) AS chunk_md5
FROM frames
