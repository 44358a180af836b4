WITH cohorts AS (
    -- DuckDB date_trunc('week') yields DATE; cast back to
    -- TIMESTAMP to match Spark's timestamp truncation
    SELECT user_id,
           CAST(date_trunc('week', min(ts)) AS TIMESTAMP)
               AS cohort_week
    FROM events GROUP BY 1
), active AS (
    SELECT DISTINCT user_id,
           CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
    FROM events
), matrix AS (
    SELECT c.cohort_week,
           date_diff('day', c.cohort_week, a.week) // 7
               AS week_offset,
           count(*) AS n_active
    FROM active a JOIN cohorts c ON a.user_id = c.user_id
    GROUP BY 1, 2
), base AS (
    SELECT cohort_week, count(*) AS cohort_size
    FROM cohorts GROUP BY 1
)
SELECT m.cohort_week, m.week_offset, m.n_active, b.cohort_size,
       CAST(floor(m.n_active / b.cohort_size * 1000000.0 + 0.5)
            / 1000000.0 AS DOUBLE) AS retention
FROM matrix m JOIN base b ON m.cohort_week = b.cohort_week
