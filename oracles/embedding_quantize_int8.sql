WITH d AS (
    SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
    FROM (SELECT vec_id, embedding,
                 unnest(generate_series(1, len(embedding))) AS i
          FROM embeddings)
), m AS (
    SELECT vec_id, max(abs(x)) AS m FROM d GROUP BY vec_id
)
SELECT d.vec_id,
       floor((m.m / 127.0) * 1000000.0 + 0.5) / 1000000.0 AS qscale,
       string_agg(
           CAST(CAST(CASE WHEN m.m = 0.0 THEN 0.0
                          ELSE floor(x * 127.0 / m.m + 0.5)
                     END AS BIGINT) AS VARCHAR),
           ',' ORDER BY i) AS q_str
FROM d JOIN m USING (vec_id)
GROUP BY d.vec_id, m.m
