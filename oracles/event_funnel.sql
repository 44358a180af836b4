WITH v AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY 1
), c AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.ts > v.t1
    GROUP BY 1
), p AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.t2
    GROUP BY 1
), stages AS (
    SELECT '1_view' AS stage, count(*) AS n_users FROM v
    UNION ALL
    SELECT '2_click', count(*) FROM c
    UNION ALL
    SELECT '3_purchase', count(*) FROM p
), top AS (SELECT count(*) AS top_n FROM v)
SELECT stage, n_users,
       floor((n_users / top.top_n) * 1000000.0 + 0.5)
           / 1000000.0 AS pct_of_top
FROM stages CROSS JOIN top
