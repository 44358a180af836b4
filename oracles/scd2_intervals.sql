SELECT user_id, event_id, value,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       CAST(lead(ts) OVER w IS NULL AS INTEGER) AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
