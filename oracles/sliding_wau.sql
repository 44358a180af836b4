WITH ud AS (
    SELECT DISTINCT user_id,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
    FROM events
), bounds AS (
    SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS lo,
           CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS hi
    FROM events
), spine AS (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))
               AS day
    FROM bounds
), contrib AS (
    SELECT DISTINCT user_id,
           day + k * INTERVAL 1 DAY AS day
    FROM ud, (SELECT unnest(generate_series(0, 6)) AS k)
), wau AS (
    SELECT day, count(*) AS wau FROM contrib GROUP BY 1
)
SELECT s.day, coalesce(w.wau, 0) AS wau
FROM spine s LEFT JOIN wau w ON s.day = w.day
