SELECT c_mktsegment, count(*) AS n_events,
       floor((CAST(sum(CAST(floor((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
