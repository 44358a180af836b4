WITH b AS (
    SELECT event_type,
           quantile_cont(value, 0.01) AS p_lo,
           quantile_cont(value, 0.99) AS p_hi
    FROM events GROUP BY event_type
), c AS (
    SELECT e.event_type, b.p_lo, b.p_hi,
           CASE WHEN e.value < b.p_lo THEN 1 ELSE 0 END AS is_lo,
           CASE WHEN e.value > b.p_hi THEN 1 ELSE 0 END AS is_hi,
           CAST(floor(greatest(least(e.value, b.p_hi), b.p_lo)
                      * 1000000.0 + 0.5) AS BIGINT) AS cv
    FROM events e JOIN b ON e.event_type = b.event_type
)
SELECT event_type,
       floor(min(p_lo) * 1000000.0 + 0.5) / 1000000.0 AS p01,
       floor(min(p_hi) * 1000000.0 + 0.5) / 1000000.0 AS p99,
       CAST(sum(is_lo) AS BIGINT) AS n_clipped_lo,
       CAST(sum(is_hi) AS BIGINT) AS n_clipped_hi,
       count(*) AS n,
       floor(((CAST(sum(cv) AS DOUBLE) / 1000000.0) / count(*))
             * 1000000.0 + 0.5) / 1000000.0 AS clipped_mean
FROM c GROUP BY event_type
