SELECT user_id, event_type, version, ts, value, event_id FROM (
    SELECT user_id, event_type, ts, value, event_id,
           row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC) AS version
    FROM events)
WHERE version <= 3
