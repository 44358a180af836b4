-- exact-integer OLS mirror of the applyInPandas slope:
-- x = µs offsets (BIGINT), y = value cents (BIGINT), HUGEINT
-- sums, one final double division — order-independent, unlike
-- regr_slope's float accumulation
WITH c AS (
    SELECT user_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS yc,
           epoch_us(ts)
               - min(epoch_us(ts)) OVER (PARTITION BY user_id)
               AS xu
    FROM events
), s AS (
    SELECT user_id, count(*) AS n,
           sum(CAST(xu AS HUGEINT)) AS sx,
           sum(CAST(yc AS HUGEINT)) AS sy,
           sum(CAST(xu AS HUGEINT) * yc) AS sxy,
           sum(CAST(xu AS HUGEINT) * xu) AS sxx
    FROM c GROUP BY user_id
)
SELECT user_id,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE floor(((CAST(n * sxy - sx * sy AS DOUBLE)
                        / CAST(n * sxx - sx * sx AS DOUBLE))
                       * 36000000.0) * 1000000.0 + 0.5) / 1000000.0
       END AS slope,
       n AS n_events
FROM s
