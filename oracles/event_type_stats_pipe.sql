SELECT event_type, count(*) AS n,
       CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_value_micros
FROM events
WHERE value > 50.0
GROUP BY event_type
