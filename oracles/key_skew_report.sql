WITH c AS (
    SELECT user_id, count(*) AS cnt FROM events GROUP BY 1
), d AS (
    SELECT user_id, cnt,
           CAST(length(CAST(cnt AS VARCHAR)) - 1 AS BIGINT)
               AS decade
    FROM c
), m AS (
    SELECT decade, count(*) AS n_keys, max(cnt) AS max_cnt
    FROM d GROUP BY 1
)
SELECT m.decade, m.n_keys, m.max_cnt,
       min(d.user_id) AS hottest_key
FROM m JOIN d ON d.decade = m.decade AND d.cnt = m.max_cnt
GROUP BY 1, 2, 3
