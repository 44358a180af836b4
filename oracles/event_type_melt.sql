SELECT user_id, event_type,
       floor((CAST(sum(CAST(floor(value * 1000000.0 + 0.5)
                           AS BIGINT)) AS DOUBLE) / 1000000.0)
             * 1000000.0 + 0.5) / 1000000.0 AS total_value
FROM events
WHERE event_type IN ('click','view','purchase','signup','error')
GROUP BY user_id, event_type
