WITH p AS (
    SELECT event_id AS purchase_id, user_id AS p_user,
           ts AS p_ts
    FROM events WHERE event_type = 'purchase'
), c AS (
    SELECT event_id AS click_id, user_id AS c_user, ts AS c_ts
    FROM events WHERE event_type = 'click'
), m AS (
    SELECT p.purchase_id, p.p_user, p.p_ts,
           c.click_id, c.c_user, c.c_ts
    FROM p JOIN c ON p.p_user = c.c_user
     AND c.c_ts >= p.p_ts - INTERVAL '1 hour'
     AND c.c_ts < p.p_ts
), mx AS (
    SELECT least(max(CASE WHEN event_type = 'purchase' THEN ts END),
                 max(CASE WHEN event_type = 'click' THEN ts END))
           AS mt
    FROM events
)
SELECT purchase_id, p_user, p_ts, click_id, c_user, c_ts FROM m
UNION ALL
SELECT p.purchase_id, p.p_user, p.p_ts,
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS TIMESTAMP)
FROM p CROSS JOIN mx
WHERE p.p_ts <= mx.mt - INTERVAL '3 hours'
  AND NOT EXISTS (
      SELECT 1 FROM m WHERE m.purchase_id = p.purchase_id)
UNION ALL
SELECT CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS TIMESTAMP),
       c.click_id, c.c_user, c.c_ts
FROM c CROSS JOIN mx
WHERE c.c_ts <= mx.mt - INTERVAL '4 hours'
  AND NOT EXISTS (
      SELECT 1 FROM m WHERE m.click_id = c.click_id)
