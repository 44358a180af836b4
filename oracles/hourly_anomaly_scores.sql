WITH hourly AS (
    SELECT date_trunc('hour', ts) AS hour, count(*) AS n
    FROM events GROUP BY 1
), win AS (
    SELECT hour, n,
           sum(n) OVER w AS s,
           sum(n * n) OVER w AS s2,
           count(*) OVER w AS k
    FROM hourly
    WINDOW w AS (ORDER BY hour
                 ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT hour, n,
       CASE WHEN k = 24
                 AND (k * s2 - s * s) * 1.0 / (k * k) > 0
            THEN floor(((n - s * 1.0 / k)
                        / sqrt((k * s2 - s * s) * 1.0 / (k * k)))
                       * 1000000.0 + 0.5) / 1000000.0
       END AS zscore
FROM win WHERE k = 24
