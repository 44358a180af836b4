WITH flagged AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts > lag(ts) OVER w + INTERVAL '30 minutes'
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
    SELECT user_id, ts, event_id, value,
           CAST(sum(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS session_id
    FROM flagged
)
SELECT user_id, session_id,
       count(*) AS n_events,
       CAST(sum(CAST(floor((value) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS session_value_micros,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
FROM sessions GROUP BY user_id, session_id
