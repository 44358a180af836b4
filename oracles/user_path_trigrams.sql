WITH s AS (
    SELECT event_type || '>' || lead(event_type, 1) OVER w
           || '>' || lead(event_type, 2) OVER w AS path,
           lead(event_type, 2) OVER w AS t3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT path, count(*) AS n FROM s
WHERE t3 IS NOT NULL GROUP BY 1
