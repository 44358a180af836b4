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
), buckets AS (
    SELECT vec_id,
           CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
    FROM proj GROUP BY vec_id
), ev AS (
    SELECT e.vec_id, e.embedding, b.bucket
    FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
), cand AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           a.embedding AS emb_a, b.embedding AS emb_b
    FROM ev a JOIN ev b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
), sums AS (
    SELECT id_a, id_b,
           sum(CAST(floor(CAST(emb_a[i] AS DOUBLE) * CAST(emb_b[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS dot,
           sum(CAST(floor(CAST(emb_a[i] AS DOUBLE) * CAST(emb_a[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS aa,
           sum(CAST(floor(CAST(emb_b[i] AS DOUBLE) * CAST(emb_b[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS bb
    FROM (SELECT id_a, id_b, emb_a, emb_b,
                 unnest(generate_series(1, len(emb_a))) AS i
          FROM cand)
    GROUP BY id_a, id_b
)
SELECT id_a, id_b,
       floor((dot / (sqrt(aa) * sqrt(bb))) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
FROM sums
WHERE floor((dot / (sqrt(aa) * sqrt(bb))) * 1000000.0 + 0.5) / 1000000.0 >= 0.4
