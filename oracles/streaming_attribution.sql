SELECT p.event_id AS purchase_id, p.user_id, c.ts AS c_ts
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL '1 hour' AND c.ts < p.ts
