SELECT p.event_id AS purchase_id, p.user_id,
       count(*) AS n_prior_clicks, max(c.ts) AS last_click_ts
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL '1 hour' AND c.ts < p.ts
GROUP BY 1, 2
