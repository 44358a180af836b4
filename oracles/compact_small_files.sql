-- Small-file compaction: both file counts are deterministic (round-robin
-- repartition distributes evenly, so with n >= k every partition is
-- non-empty and writes exactly one file), and the checksum proves the
-- rewrite is multiset-lossless. 64 fragment files and 4096 rows/file
-- mirror COMPACT_FRAGMENT_FILES / COMPACT_TARGET_ROWS in
-- geektime_bigdata_spark/operators/scale.py.
SELECT CAST(64 AS BIGINT) AS files_before,
       CAST(ceil(count(*) / 4096.0) AS BIGINT) AS files_after,
       count(*) AS n_rows,
       CAST(sum(('0x' || substr(md5(event_id || '|' || user_id || '|' ||
                                    event_type), 1, 8))::BIGINT)
            AS BIGINT) AS row_checksum
FROM events
