SELECT user_id,
       floor((CAST(sum(CAST(floor((CASE WHEN event_type = 'click' THEN value ELSE 0 END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS sum_up,
       floor((CAST(sum(CAST(floor((CASE WHEN event_type = 'view' THEN value ELSE 0 END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS sum_down,
       floor((CAST(sum(CAST(floor((CASE WHEN event_type IN ('click','view') THEN value ELSE 0 END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS sum_total
FROM events GROUP BY user_id
