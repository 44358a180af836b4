-- Closed-form twin of the z-order vs lexicographic layout scorer.
-- Same integer pipeline as the Spark side: quantize user_id x event_id
-- to a 16x16 grid from exact min/max bounds, assign each row to one of
-- 32 "files" under each layout (Morton code >> 3 vs (ux*16+vx) >> 3),
-- build per-file zone maps (min/max of each dimension), and score the
-- fixed quantized box ux IN [3,6], vx IN [7,10] by zone-map overlap.
-- All-integer: `//` here mirrors Spark's `div` (both floor on the
-- nonnegative operands quantization produces), and DuckDB's bitwise
-- <<, >>, &, | match Spark's shiftleft/shiftright/&/| exactly on
-- BIGINT. Sums are CAST to BIGINT (DuckDB widens sum to HUGEINT).
WITH b AS (
    SELECT min(user_id) AS u_min, max(user_id) AS u_max,
           min(event_id) AS e_min, max(event_id) AS e_max
    FROM events
),
q AS (
    SELECT ((user_id - u_min) * 16) // (u_max - u_min + 1) AS ux,
           ((event_id - e_min) * 16) // (e_max - e_min + 1) AS vx
    FROM events, b
),
z AS (
    SELECT ux, vx,
           (((ux >> 3) & 1) << 7) | (((vx >> 3) & 1) << 6)
         | (((ux >> 2) & 1) << 5) | (((vx >> 2) & 1) << 4)
         | (((ux >> 1) & 1) << 3) | (((vx >> 1) & 1) << 2)
         | ((ux & 1) << 1) | (vx & 1) AS zv
    FROM q
),
tagged AS (
    SELECT 'zorder' AS layout, zv >> 3 AS file_id, ux, vx FROM z
    UNION ALL
    SELECT 'lexicographic' AS layout, (ux * 16 + vx) >> 3 AS file_id,
           ux, vx
    FROM z
),
zone_maps AS (
    SELECT layout, file_id,
           min(ux) AS min_ux, max(ux) AS max_ux,
           min(vx) AS min_vx, max(vx) AS max_vx,
           count(*) AS n_rows,
           sum(CASE WHEN ux BETWEEN 3 AND 6 AND vx BETWEEN 7 AND 10
                    THEN 1 ELSE 0 END) AS n_match
    FROM tagged
    GROUP BY layout, file_id
)
SELECT layout,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN min_ux <= 6 AND max_ux >= 3
                      AND min_vx <= 10 AND max_vx >= 7
                     THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       CAST(sum(CASE WHEN min_ux <= 6 AND max_ux >= 3
                      AND min_vx <= 10 AND max_vx >= 7
                     THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
       CAST(sum(n_match) AS BIGINT) AS rows_matched
FROM zone_maps
GROUP BY layout
