WITH hourly AS (
    SELECT date_trunc('hour', ts) AS hour,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 1000000.0 + 0.5)
                         AS BIGINT)) AS BIGINT)
               AS value_micros
    FROM events GROUP BY 1
), bounds AS (
    SELECT date_trunc('hour', min(ts)) AS lo,
           date_trunc('hour', max(ts)) AS hi
    FROM events
), spine AS (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
               AS hour
    FROM bounds
)
SELECT s.hour,
       coalesce(h.n_events, 0) AS n_events,
       CAST(CASE WHEN h.n_events IS NULL THEN 1 ELSE 0 END
            AS BIGINT) AS is_gap,
       last_value(h.value_micros IGNORE NULLS)
           OVER (ORDER BY s.hour
                 ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS ff_value_micros
FROM spine s LEFT JOIN hourly h ON s.hour = h.hour
