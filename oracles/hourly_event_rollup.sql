SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n, floor((CAST(sum(CAST(floor((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS total_value
FROM events GROUP BY 1, 2
