WITH p AS (
    SELECT event_id AS purchase_id, user_id, ts AS p_ts
    FROM events WHERE event_type = 'purchase'
), c AS (
    SELECT user_id AS c_user, ts AS c_ts
    FROM events WHERE event_type = 'click'
), m AS (
    SELECT p.purchase_id, p.user_id, p.p_ts, c.c_ts
    FROM p JOIN c ON p.user_id = c.c_user
     AND c.c_ts >= p.p_ts - INTERVAL '1 hour'
     AND c.c_ts < p.p_ts
), mx AS (
    -- engine watermark = min over the two watermark operators,
    -- each on its own filtered stream; -3h = 2h delay + 1h
    -- safety margin inside the eviction boundary
    SELECT least(max(CASE WHEN event_type = 'purchase' THEN ts END),
                 max(CASE WHEN event_type = 'click' THEN ts END))
           AS mt
    FROM events
)
SELECT purchase_id, user_id, p_ts, c_ts FROM m
UNION ALL
SELECT p.purchase_id, p.user_id, p.p_ts,
       CAST(NULL AS TIMESTAMP) AS c_ts
FROM p CROSS JOIN mx
WHERE p.p_ts <= mx.mt - INTERVAL '3 hours'
  AND NOT EXISTS (
      SELECT 1 FROM m WHERE m.purchase_id = p.purchase_id)
