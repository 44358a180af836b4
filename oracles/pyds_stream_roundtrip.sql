SELECT event_type, count(*) AS n,
       CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_value_micros
FROM events
GROUP BY event_type
