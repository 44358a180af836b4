WITH cent AS (
    SELECT label AS cell, pos,
           floor((CAST(sum(CAST(floor((CAST(embedding[pos] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS c
    FROM (SELECT label, embedding,
                 unnest(generate_series(1, 64)) AS pos
          FROM embeddings)
    GROUP BY 1, 2
), dist AS (
    SELECT v.vec_id, c.cell,
           floor((sum(CAST(floor((CAST(v.embedding[c.pos] AS DOUBLE) - c.c)
                     * (CAST(v.embedding[c.pos] AS DOUBLE) - c.c)
                     * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS d2
    FROM embeddings v CROSS JOIN cent c
    GROUP BY 1, 2
), ranked AS (
    SELECT vec_id, cell, row_number() OVER (
        PARTITION BY vec_id ORDER BY d2, cell) AS rn
    FROM dist
), dims AS (
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
    SELECT r.vec_id, r.cell, b.bucket
    FROM ranked r JOIN buckets b USING (vec_id)
    WHERE r.rn = 1
), pv AS (
    SELECT r.vec_id, r.cell, b.bucket
    FROM ranked r JOIN buckets b USING (vec_id)
    WHERE r.rn <= 2
), cand AS (
    SELECT x.vec_id AS id_a, y.vec_id AS id_b
    FROM pv x JOIN ev y
      ON x.cell = y.cell AND x.bucket = y.bucket
     AND x.vec_id < y.vec_id
    UNION
    SELECT x.vec_id AS id_a, y.vec_id AS id_b
    FROM ev x JOIN pv y
      ON x.cell = y.cell AND x.bucket = y.bucket
     AND x.vec_id < y.vec_id
), sums AS (
    SELECT id_a, id_b,
           sum(CAST(floor(CAST(emb_a[i] AS DOUBLE) * CAST(emb_b[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS dot,
           sum(CAST(floor(CAST(emb_a[i] AS DOUBLE) * CAST(emb_a[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS aa,
           sum(CAST(floor(CAST(emb_b[i] AS DOUBLE) * CAST(emb_b[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS bb
    FROM (SELECT c.id_a, c.id_b,
                 p.embedding AS emb_a, q.embedding AS emb_b,
                 unnest(generate_series(1, len(p.embedding))) AS i
          FROM cand c
          JOIN embeddings p ON p.vec_id = c.id_a
          JOIN embeddings q ON q.vec_id = c.id_b)
    GROUP BY id_a, id_b
), close AS (
    SELECT id_a, id_b,
           floor((dot / (sqrt(aa) * sqrt(bb))) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
    FROM sums
    WHERE floor((dot / (sqrt(aa) * sqrt(bb))) * 1000000.0 + 0.5) / 1000000.0 >= 0.2
)
SELECT id_b AS vec_id, min(id_a) AS keeper_id,
       arg_min(cos_sim, id_a) AS cos_sim
FROM close GROUP BY 1
