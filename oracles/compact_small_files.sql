-- Small-file compaction: both file counts are deterministic (round-robin
-- repartition distributes evenly, so with n >= k every partition is
-- non-empty and writes exactly one file), and the checksum proves the
-- rewrite is multiset-lossless. 64 fragment files and 4096 rows/file
-- mirror COMPACT_FRAGMENT_FILES / COMPACT_TARGET_ROWS in
-- geektime_bigdata_spark/operators/scale.py.
-- PRECONDITIONS (documented per ADVICE r5, both hold at every shipped
-- scale and are pinned by tests):
--   * files_before = 64 relies on the round-robin slot-coverage
--     invariant — at least one scan partition of events holds >= 64
--     rows (events ships as ONE parquet file of 1k-100k rows; the
--     invariant itself is pinned by a hypothesis property test in
--     tests/test_scale_techniques.py). A future many-tiny-files or
--     sub-64-row events fixture would fail this oracle, not the op.
--   * concat_ws skips NULL columns identically in Spark and DuckDB
--     (value AND separator dropped), so the checksum stays byte-equal
--     even if a future events fixture carries NULLs in these columns —
--     unlike `||`, which would NULL out the whole row hash in DuckDB
--     only.
SELECT CAST(64 AS BIGINT) AS files_before,
       CAST(ceil(count(*) / 4096.0) AS BIGINT) AS files_after,
       count(*) AS n_rows,
       CAST(sum(('0x' || substr(md5(concat_ws('|', event_id, user_id,
                                               event_type)), 1, 8))::BIGINT)
            AS BIGINT) AS row_checksum
FROM events
