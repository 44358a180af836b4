SELECT user_id, event_id,
       CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) OVER w AS BIGINT) AS running_value_micros,
       count(*) OVER w AS event_idx
FROM events
WINDOW w AS (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
)
