SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       max(c.ts) AS last_click_ts,
       count(c.ts) AS n_prior_clicks
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
GROUP BY p.event_id, p.user_id, p.ts
