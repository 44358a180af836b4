WITH comp AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS i,
           unnest(embedding) AS x
    FROM embeddings
), tri AS MATERIALIZED (
    SELECT a.i AS i, b.i AS j,
           CAST(sum(CAST(floor(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)
                          * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS gram_micros
    FROM comp a JOIN comp b
      ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY a.i, b.i
), g AS MATERIALIZED (
    SELECT i, j, gram_micros FROM tri
    UNION ALL
    SELECT j AS i, i AS j, gram_micros FROM tri WHERE i < j
), v0 AS (
    SELECT unnest(generate_series(1, 64)) AS j,
           CAST(125000 AS BIGINT) AS v_micros
), w1 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w_micros
    FROM g g JOIN v0 v ON g.j = v.j GROUP BY g.i
), m1 AS (
    SELECT CAST(sum(CAST(floor((w_micros / 1e6) * (w_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS n2_micros
    FROM w1
), v1 AS MATERIALIZED (
    SELECT i AS j,
           CAST(floor((w_micros / 1e6) / sqrt(n2_micros / 1e6)
                * 1e6 + 0.5) AS BIGINT) AS v_micros
    FROM w1, m1
), w2 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w_micros
    FROM g g JOIN v1 v ON g.j = v.j GROUP BY g.i
), m2 AS (
    SELECT CAST(sum(CAST(floor((w_micros / 1e6) * (w_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS n2_micros
    FROM w2
), v2 AS MATERIALIZED (
    SELECT i AS j,
           CAST(floor((w_micros / 1e6) / sqrt(n2_micros / 1e6)
                * 1e6 + 0.5) AS BIGINT) AS v_micros
    FROM w2, m2
), w3 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w_micros
    FROM g g JOIN v2 v ON g.j = v.j GROUP BY g.i
), m3 AS (
    SELECT CAST(sum(CAST(floor((w_micros / 1e6) * (w_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS n2_micros
    FROM w3
), v3 AS MATERIALIZED (
    SELECT i AS j,
           CAST(floor((w_micros / 1e6) / sqrt(n2_micros / 1e6)
                * 1e6 + 0.5) AS BIGINT) AS v_micros
    FROM w3, m3
), w4 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w_micros
    FROM g g JOIN v3 v ON g.j = v.j GROUP BY g.i
), m4 AS (
    SELECT CAST(sum(CAST(floor((w_micros / 1e6) * (w_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS n2_micros
    FROM w4
), v4 AS MATERIALIZED (
    SELECT i AS j,
           CAST(floor((w_micros / 1e6) / sqrt(n2_micros / 1e6)
                * 1e6 + 0.5) AS BIGINT) AS v_micros
    FROM w4, m4
), w5 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w_micros
    FROM g g JOIN v4 v ON g.j = v.j GROUP BY g.i
), m5 AS (
    SELECT CAST(sum(CAST(floor((w_micros / 1e6) * (w_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS n2_micros
    FROM w5
), v5 AS MATERIALIZED (
    SELECT i AS j,
           CAST(floor((w_micros / 1e6) / sqrt(n2_micros / 1e6)
                * 1e6 + 0.5) AS BIGINT) AS v_micros
    FROM w5, m5
), w6 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w_micros
    FROM g g JOIN v5 v ON g.j = v.j GROUP BY g.i
), m6 AS (
    SELECT CAST(sum(CAST(floor((w_micros / 1e6) * (w_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS n2_micros
    FROM w6
), v6 AS MATERIALIZED (
    SELECT i AS j,
           CAST(floor((w_micros / 1e6) / sqrt(n2_micros / 1e6)
                * 1e6 + 0.5) AS BIGINT) AS v_micros
    FROM w6, m6
), w7 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w_micros
    FROM g g JOIN v6 v ON g.j = v.j GROUP BY g.i
), m7 AS (
    SELECT CAST(sum(CAST(floor((w_micros / 1e6) * (w_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS n2_micros
    FROM w7
), v7 AS MATERIALIZED (
    SELECT i AS j,
           CAST(floor((w_micros / 1e6) / sqrt(n2_micros / 1e6)
                * 1e6 + 0.5) AS BIGINT) AS v_micros
    FROM w7, m7
), w8 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w_micros
    FROM g g JOIN v7 v ON g.j = v.j GROUP BY g.i
), m8 AS (
    SELECT CAST(sum(CAST(floor((w_micros / 1e6) * (w_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS n2_micros
    FROM w8
), v8 AS MATERIALIZED (
    SELECT i AS j,
           CAST(floor((w_micros / 1e6) / sqrt(n2_micros / 1e6)
                * 1e6 + 0.5) AS BIGINT) AS v_micros
    FROM w8, m8
), lam1 AS (
    SELECT CAST(floor(sqrt(n2_micros / 1e6) * 1e6 + 0.5) AS BIGINT)
        AS lambda_micros FROM m8
), g2 AS MATERIALIZED (
    SELECT g.i, g.j,
           CAST(g.gram_micros - CAST(floor((l.lambda_micros / 1e6)
                * (vi.v_micros / 1e6) * (vj.v_micros / 1e6)
                * 1e6 + 0.5) AS BIGINT) AS BIGINT) AS gram_micros
    FROM g
    JOIN v8 vi ON vi.j = g.i
    JOIN v8 vj ON vj.j = g.j
    CROSS JOIN lam1 l
), v0b AS (
    SELECT unnest(generate_series(1, 64)) AS j,
           CAST(125000 AS BIGINT) AS v_micros
), w9 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w_micros
    FROM g2 g JOIN v0b v ON g.j = v.j GROUP BY g.i
), m9 AS (
    SELECT CAST(sum(CAST(floor((w_micros / 1e6) * (w_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS n2_micros
    FROM w9
), v9 AS MATERIALIZED (
    SELECT i AS j,
           CAST(floor((w_micros / 1e6) / sqrt(n2_micros / 1e6)
                * 1e6 + 0.5) AS BIGINT) AS v_micros
    FROM w9, m9
), w10 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w_micros
    FROM g2 g JOIN v9 v ON g.j = v.j GROUP BY g.i
), m10 AS (
    SELECT CAST(sum(CAST(floor((w_micros / 1e6) * (w_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS n2_micros
    FROM w10
), v10 AS MATERIALIZED (
    SELECT i AS j,
           CAST(floor((w_micros / 1e6) / sqrt(n2_micros / 1e6)
                * 1e6 + 0.5) AS BIGINT) AS v_micros
    FROM w10, m10
), w11 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w_micros
    FROM g2 g JOIN v10 v ON g.j = v.j GROUP BY g.i
), m11 AS (
    SELECT CAST(sum(CAST(floor((w_micros / 1e6) * (w_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS n2_micros
    FROM w11
), v11 AS MATERIALIZED (
    SELECT i AS j,
           CAST(floor((w_micros / 1e6) / sqrt(n2_micros / 1e6)
                * 1e6 + 0.5) AS BIGINT) AS v_micros
    FROM w11, m11
), w12 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w_micros
    FROM g2 g JOIN v11 v ON g.j = v.j GROUP BY g.i
), m12 AS (
    SELECT CAST(sum(CAST(floor((w_micros / 1e6) * (w_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS n2_micros
    FROM w12
), v12 AS MATERIALIZED (
    SELECT i AS j,
           CAST(floor((w_micros / 1e6) / sqrt(n2_micros / 1e6)
                * 1e6 + 0.5) AS BIGINT) AS v_micros
    FROM w12, m12
), w13 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w_micros
    FROM g2 g JOIN v12 v ON g.j = v.j GROUP BY g.i
), m13 AS (
    SELECT CAST(sum(CAST(floor((w_micros / 1e6) * (w_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS n2_micros
    FROM w13
), v13 AS MATERIALIZED (
    SELECT i AS j,
           CAST(floor((w_micros / 1e6) / sqrt(n2_micros / 1e6)
                * 1e6 + 0.5) AS BIGINT) AS v_micros
    FROM w13, m13
), w14 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w_micros
    FROM g2 g JOIN v13 v ON g.j = v.j GROUP BY g.i
), m14 AS (
    SELECT CAST(sum(CAST(floor((w_micros / 1e6) * (w_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS n2_micros
    FROM w14
), v14 AS MATERIALIZED (
    SELECT i AS j,
           CAST(floor((w_micros / 1e6) / sqrt(n2_micros / 1e6)
                * 1e6 + 0.5) AS BIGINT) AS v_micros
    FROM w14, m14
), w15 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w_micros
    FROM g2 g JOIN v14 v ON g.j = v.j GROUP BY g.i
), m15 AS (
    SELECT CAST(sum(CAST(floor((w_micros / 1e6) * (w_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS n2_micros
    FROM w15
), v15 AS MATERIALIZED (
    SELECT i AS j,
           CAST(floor((w_micros / 1e6) / sqrt(n2_micros / 1e6)
                * 1e6 + 0.5) AS BIGINT) AS v_micros
    FROM w15, m15
), w16 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w_micros
    FROM g2 g JOIN v15 v ON g.j = v.j GROUP BY g.i
), m16 AS (
    SELECT CAST(sum(CAST(floor((w_micros / 1e6) * (w_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS n2_micros
    FROM w16
), v16 AS MATERIALIZED (
    SELECT i AS j,
           CAST(floor((w_micros / 1e6) / sqrt(n2_micros / 1e6)
                * 1e6 + 0.5) AS BIGINT) AS v_micros
    FROM w16, m16
), lam2 AS (
    SELECT CAST(floor(sqrt(n2_micros / 1e6) * 1e6 + 0.5) AS BIGINT)
        AS lambda_micros FROM m16
), pair AS MATERIALIZED (
    SELECT a.j, a.v_micros AS a, b.v_micros AS b
    FROM v8 a JOIN v16 b ON a.j = b.j
), dotp AS (
    SELECT CAST(sum(CAST(floor((a / 1e6) * (b / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS dot_micros
    FROM pair
), u AS MATERIALIZED (
    SELECT j,
           CAST(b - CAST(floor((dot_micros / 1e6) * (a / 1e6)
                * 1e6 + 0.5) AS BIGINT) AS BIGINT) AS u_micros
    FROM pair, dotp
), un2 AS (
    SELECT CAST(sum(CAST(floor((u_micros / 1e6) * (u_micros / 1e6)
                    * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS n2_micros
    FROM u
), v2f AS MATERIALIZED (
    SELECT j,
           CAST(floor((u_micros / 1e6) / sqrt(n2_micros / 1e6)
                * 1e6 + 0.5) AS BIGINT) AS v_micros
    FROM u, un2
)
SELECT a.j AS component,
       a.v_micros AS v1_micros,
       b.v_micros AS v2_micros,
       (SELECT lambda_micros FROM lam1) AS lambda1_micros,
       (SELECT lambda_micros FROM lam2) AS lambda2_micros
FROM v8 a JOIN v2f b ON a.j = b.j
