WITH flagged AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts > lag(ts) OVER w + INTERVAL '30 minutes'
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
    SELECT user_id, ts, value,
           CAST(sum(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS session_id
    FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) AS last_event_ts,
       count(*) AS n_events,
       floor((CAST(sum(CAST(floor((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS session_value
FROM sessions GROUP BY user_id, session_id
