WITH a AS (SELECT max(ts) AS m FROM events)
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CAST(floor(exp(-(CAST(epoch_us(a.m) - epoch_us(ts)
                                 AS DOUBLE) / 86400000000.0))
                      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS recency_micros
FROM events CROSS JOIN a
GROUP BY user_id
