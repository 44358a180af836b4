SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT))
           AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT))
           AS max_k,
       count(*) AS n,
       CAST(count(CASE WHEN json_extract_string(props, '$.missing')
                       IS NOT NULL THEN 1 END) AS BIGINT)
           AS n_missing_present
FROM events GROUP BY event_type
