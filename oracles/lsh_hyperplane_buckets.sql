WITH dims AS (
    SELECT vec_id, pos - 1 AS d, CAST(embedding[pos] AS DOUBLE) AS x
    FROM (SELECT vec_id, embedding,
                 unnest(generate_series(1, len(embedding))) AS pos
          FROM embeddings)
), planes AS (
    SELECT p, d,
           ((('0x' || substr(md5(p || ',' || d), 1, 8))::BIGINT % 2001) - 1000) / 1000.0 AS w
    FROM (SELECT unnest(generate_series(0, 7)) AS p),
         (SELECT unnest(generate_series(0, 63)) AS d)
), proj AS (
    SELECT vec_id, p, sum(CAST(floor(x * w * 1000000.0 + 0.5) AS BIGINT)) AS proj
    FROM dims JOIN planes USING (d) GROUP BY vec_id, p
)
SELECT vec_id,
       CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
FROM proj GROUP BY vec_id
