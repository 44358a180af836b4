SELECT event_type,
       least(greatest(CAST(floor(value / 10.0) AS BIGINT), 0), 9)
           AS bin,
       count(*) AS n
FROM events
GROUP BY 1, 2
