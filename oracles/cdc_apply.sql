WITH ranked AS (
    SELECT user_id, event_type,
           CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)
               AS value_micros,
           ts,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC)
               AS rn,
           count(*) OVER (PARTITION BY user_id) AS n_ops
    FROM events
)
SELECT user_id, event_type AS last_op,
       value_micros AS last_value_micros,
       ts AS last_ts, n_ops
FROM ranked WHERE rn = 1 AND event_type <> 'error'
