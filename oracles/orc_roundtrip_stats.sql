-- ORC roundtrip: the aggregate computed straight off the parquet must
-- equal what the engine computes from the written-then-reread ORC —
-- covering the types JSONL cannot carry losslessly (TIMESTAMP micros,
-- DOUBLE). epoch_us == Spark unix_micros under the UTC session
-- (probed r13). The timestamp integrity signal is min/max epoch plus
-- an order-independent md5-derived checksum over the per-row epoch
-- string: summing raw epoch micros (~1.7e15/row) overflows int64 past
-- ~5400 rows, while the 8-hex checksum terms stay <= 4.3e9/row — the
-- same bound every checksum aggregate in the engine rides. The
-- micro-grid value sum mirrors the engine's floor form exactly.
-- The '0x…'::BIGINT hex cast is engine-version-sensitive (verified
-- on the container's DuckDB 1.0.0; pinned by
-- tests/test_oracle_types.py::test_duckdb_hex_cast_canary, which
-- names the cause if an engine upgrade ever changes string->int
-- parsing). Shared verbatim by csv_roundtrip_stats (_ORACLE_TWINS):
-- both trips aggregate back to this same straight-off-parquet truth.
SELECT event_type,
       count(*) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(min(epoch_us(ts)) AS BIGINT) AS ts_min_micros,
       CAST(max(epoch_us(ts)) AS BIGINT) AS ts_max_micros,
       CAST(sum(('0x' || substr(md5(CAST(epoch_us(ts) AS VARCHAR)),
                                1, 8))::BIGINT) AS BIGINT)
           AS ts_checksum,
       CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
           AS value_micros_sum,
       CAST(sum(event_id) AS BIGINT) AS event_id_sum
FROM events
WHERE event_type IN ('click', 'purchase', 'signup')
GROUP BY event_type
