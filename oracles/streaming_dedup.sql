SELECT DISTINCT user_id, event_type FROM events
