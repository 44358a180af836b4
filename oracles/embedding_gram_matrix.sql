WITH comp AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS i,
           unnest(embedding) AS x
    FROM embeddings
)
SELECT a.i AS i, b.i AS j,
       CAST(sum(CAST(floor(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS gram_micros
FROM comp a JOIN comp b
  ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY a.i, b.i
