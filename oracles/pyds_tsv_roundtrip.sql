SELECT event_type, count(*) AS n,
       CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_value_micros,
       count(DISTINCT user_id) AS n_users
FROM events
WHERE event_type IN ('click', 'purchase')
GROUP BY event_type
