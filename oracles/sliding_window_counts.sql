SELECT w_start, count(*) AS n, floor((CAST(sum(CAST(floor((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS total_value
FROM (
    SELECT unnest([date_trunc('hour', ts),
                   date_trunc('hour', ts) - INTERVAL '1 hour']) AS w_start,
           value
    FROM events
) GROUP BY w_start
