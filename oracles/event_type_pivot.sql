SELECT user_id,
       floor((CAST(sum(CAST(floor((CASE WHEN event_type = 'click' THEN value END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS click,
       floor((CAST(sum(CAST(floor((CASE WHEN event_type = 'view' THEN value END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS view,
       floor((CAST(sum(CAST(floor((CASE WHEN event_type = 'purchase' THEN value END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS purchase,
       floor((CAST(sum(CAST(floor((CASE WHEN event_type = 'signup' THEN value END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS signup,
       floor((CAST(sum(CAST(floor((CASE WHEN event_type = 'error' THEN value END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS error
FROM events GROUP BY user_id
