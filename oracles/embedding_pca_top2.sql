-- Top-2 PCA by BLOCK power iteration (2-column iterate + per-step
-- Gram-Schmidt), mirroring operators/similarity.embedding_pca_top2
-- step-for-step on the micro grid (r14: adopted over sequential
-- power + Hotelling deflation after a measured 39-vs-79-job,
-- 2.0-vs-3.2s win; see SURVEY §7.17). v1's trajectory is plain power
-- iteration (Gram-Schmidt never alters column 1). Every hashed edge
-- is identical IEEE ops in both engines: micro-grid floor products,
-- integer sums (each CAST AS BIGINT against HUGEINT widening), and
-- the correctly-rounded sqrt. Iterative CTEs are MATERIALIZED (the
-- house rule: DuckDB inlines plain CTEs per reference).
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
           CAST(125000 AS BIGINT) AS v1,
           CAST(CASE WHEN unnest(generate_series(1, 64)) % 2 = 0
                THEN 125000 ELSE -125000 END AS BIGINT) AS v2
), w1 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v1 / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w1,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v2 / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w2
    FROM g g JOIN v0 v ON g.j = v.j GROUP BY g.i
), n1a AS (
    SELECT CAST(sum(CAST(floor((w1 / 1e6) * (w1 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS n1
    FROM w1
), u1 AS MATERIALIZED (
    SELECT i, w2, n1,
           CAST(floor((w1 / 1e6) / sqrt(n1 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS u1
    FROM w1, n1a
), d1 AS (
    SELECT CAST(sum(CAST(floor((u1 / 1e6) * (w2 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS dot
    FROM u1
), p1 AS MATERIALIZED (
    SELECT i, u1, n1,
           CAST(w2 - CAST(floor((dot / 1e6) * (u1 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS BIGINT) AS p2
    FROM u1, d1
), n1b AS (
    SELECT CAST(sum(CAST(floor((p2 / 1e6) * (p2 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS n2
    FROM p1
), v1 AS MATERIALIZED (
    SELECT i AS j, u1 AS v1,
           CAST(floor((p2 / 1e6) / sqrt(n2 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS v2,
           n1
    FROM p1, n1b
), w2 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v1 / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w1,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v2 / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w2
    FROM g g JOIN v1 v ON g.j = v.j GROUP BY g.i
), n2a AS (
    SELECT CAST(sum(CAST(floor((w1 / 1e6) * (w1 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS n1
    FROM w2
), u2 AS MATERIALIZED (
    SELECT i, w2, n1,
           CAST(floor((w1 / 1e6) / sqrt(n1 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS u1
    FROM w2, n2a
), d2 AS (
    SELECT CAST(sum(CAST(floor((u1 / 1e6) * (w2 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS dot
    FROM u2
), p2 AS MATERIALIZED (
    SELECT i, u1, n1,
           CAST(w2 - CAST(floor((dot / 1e6) * (u1 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS BIGINT) AS p2
    FROM u2, d2
), n2b AS (
    SELECT CAST(sum(CAST(floor((p2 / 1e6) * (p2 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS n2
    FROM p2
), v2 AS MATERIALIZED (
    SELECT i AS j, u1 AS v1,
           CAST(floor((p2 / 1e6) / sqrt(n2 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS v2,
           n1
    FROM p2, n2b
), w3 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v1 / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w1,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v2 / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w2
    FROM g g JOIN v2 v ON g.j = v.j GROUP BY g.i
), n3a AS (
    SELECT CAST(sum(CAST(floor((w1 / 1e6) * (w1 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS n1
    FROM w3
), u3 AS MATERIALIZED (
    SELECT i, w2, n1,
           CAST(floor((w1 / 1e6) / sqrt(n1 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS u1
    FROM w3, n3a
), d3 AS (
    SELECT CAST(sum(CAST(floor((u1 / 1e6) * (w2 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS dot
    FROM u3
), p3 AS MATERIALIZED (
    SELECT i, u1, n1,
           CAST(w2 - CAST(floor((dot / 1e6) * (u1 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS BIGINT) AS p2
    FROM u3, d3
), n3b AS (
    SELECT CAST(sum(CAST(floor((p2 / 1e6) * (p2 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS n2
    FROM p3
), v3 AS MATERIALIZED (
    SELECT i AS j, u1 AS v1,
           CAST(floor((p2 / 1e6) / sqrt(n2 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS v2,
           n1
    FROM p3, n3b
), w4 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v1 / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w1,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v2 / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w2
    FROM g g JOIN v3 v ON g.j = v.j GROUP BY g.i
), n4a AS (
    SELECT CAST(sum(CAST(floor((w1 / 1e6) * (w1 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS n1
    FROM w4
), u4 AS MATERIALIZED (
    SELECT i, w2, n1,
           CAST(floor((w1 / 1e6) / sqrt(n1 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS u1
    FROM w4, n4a
), d4 AS (
    SELECT CAST(sum(CAST(floor((u1 / 1e6) * (w2 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS dot
    FROM u4
), p4 AS MATERIALIZED (
    SELECT i, u1, n1,
           CAST(w2 - CAST(floor((dot / 1e6) * (u1 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS BIGINT) AS p2
    FROM u4, d4
), n4b AS (
    SELECT CAST(sum(CAST(floor((p2 / 1e6) * (p2 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS n2
    FROM p4
), v4 AS MATERIALIZED (
    SELECT i AS j, u1 AS v1,
           CAST(floor((p2 / 1e6) / sqrt(n2 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS v2,
           n1
    FROM p4, n4b
), w5 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v1 / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w1,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v2 / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w2
    FROM g g JOIN v4 v ON g.j = v.j GROUP BY g.i
), n5a AS (
    SELECT CAST(sum(CAST(floor((w1 / 1e6) * (w1 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS n1
    FROM w5
), u5 AS MATERIALIZED (
    SELECT i, w2, n1,
           CAST(floor((w1 / 1e6) / sqrt(n1 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS u1
    FROM w5, n5a
), d5 AS (
    SELECT CAST(sum(CAST(floor((u1 / 1e6) * (w2 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS dot
    FROM u5
), p5 AS MATERIALIZED (
    SELECT i, u1, n1,
           CAST(w2 - CAST(floor((dot / 1e6) * (u1 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS BIGINT) AS p2
    FROM u5, d5
), n5b AS (
    SELECT CAST(sum(CAST(floor((p2 / 1e6) * (p2 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS n2
    FROM p5
), v5 AS MATERIALIZED (
    SELECT i AS j, u1 AS v1,
           CAST(floor((p2 / 1e6) / sqrt(n2 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS v2,
           n1
    FROM p5, n5b
), w6 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v1 / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w1,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v2 / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w2
    FROM g g JOIN v5 v ON g.j = v.j GROUP BY g.i
), n6a AS (
    SELECT CAST(sum(CAST(floor((w1 / 1e6) * (w1 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS n1
    FROM w6
), u6 AS MATERIALIZED (
    SELECT i, w2, n1,
           CAST(floor((w1 / 1e6) / sqrt(n1 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS u1
    FROM w6, n6a
), d6 AS (
    SELECT CAST(sum(CAST(floor((u1 / 1e6) * (w2 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS dot
    FROM u6
), p6 AS MATERIALIZED (
    SELECT i, u1, n1,
           CAST(w2 - CAST(floor((dot / 1e6) * (u1 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS BIGINT) AS p2
    FROM u6, d6
), n6b AS (
    SELECT CAST(sum(CAST(floor((p2 / 1e6) * (p2 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS n2
    FROM p6
), v6 AS MATERIALIZED (
    SELECT i AS j, u1 AS v1,
           CAST(floor((p2 / 1e6) / sqrt(n2 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS v2,
           n1
    FROM p6, n6b
), w7 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v1 / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w1,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v2 / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w2
    FROM g g JOIN v6 v ON g.j = v.j GROUP BY g.i
), n7a AS (
    SELECT CAST(sum(CAST(floor((w1 / 1e6) * (w1 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS n1
    FROM w7
), u7 AS MATERIALIZED (
    SELECT i, w2, n1,
           CAST(floor((w1 / 1e6) / sqrt(n1 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS u1
    FROM w7, n7a
), d7 AS (
    SELECT CAST(sum(CAST(floor((u1 / 1e6) * (w2 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS dot
    FROM u7
), p7 AS MATERIALIZED (
    SELECT i, u1, n1,
           CAST(w2 - CAST(floor((dot / 1e6) * (u1 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS BIGINT) AS p2
    FROM u7, d7
), n7b AS (
    SELECT CAST(sum(CAST(floor((p2 / 1e6) * (p2 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS n2
    FROM p7
), v7 AS MATERIALIZED (
    SELECT i AS j, u1 AS v1,
           CAST(floor((p2 / 1e6) / sqrt(n2 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS v2,
           n1
    FROM p7, n7b
), w8 AS MATERIALIZED (
    SELECT g.i,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v1 / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w1,
           CAST(sum(CAST(floor((g.gram_micros / 1e6) * (v.v2 / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w2
    FROM g g JOIN v7 v ON g.j = v.j GROUP BY g.i
), n8a AS (
    SELECT CAST(sum(CAST(floor((w1 / 1e6) * (w1 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS n1
    FROM w8
), u8 AS MATERIALIZED (
    SELECT i, w2, n1,
           CAST(floor((w1 / 1e6) / sqrt(n1 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS u1
    FROM w8, n8a
), d8 AS (
    SELECT CAST(sum(CAST(floor((u1 / 1e6) * (w2 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS dot
    FROM u8
), p8 AS MATERIALIZED (
    SELECT i, u1, n1,
           CAST(w2 - CAST(floor((dot / 1e6) * (u1 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS BIGINT) AS p2
    FROM u8, d8
), n8b AS (
    SELECT CAST(sum(CAST(floor((p2 / 1e6) * (p2 / 1e6) * 1e6 + 0.5)
                    AS BIGINT)) AS BIGINT) AS n2
    FROM p8
), v8 AS MATERIALIZED (
    SELECT i AS j, u1 AS v1,
           CAST(floor((p2 / 1e6) / sqrt(n2 / 1e6) * 1e6 + 0.5)
                AS BIGINT) AS v2,
           n1
    FROM p8, n8b
), lam1 AS (
    SELECT CAST(floor(sqrt(max(n1) / 1e6) * 1e6 + 0.5) AS BIGINT)
        AS lambda1_micros FROM v8
), lam2 AS (
    SELECT CAST(sum(CAST(floor((g.gram_micros / 1e6) * (a.v2 / 1e6)
                          * (b.v2 / 1e6) * 1e6 + 0.5) AS BIGINT))
               AS BIGINT) AS lambda2_micros
    FROM g g JOIN v8 a ON g.i = a.j JOIN v8 b ON g.j = b.j
)
SELECT j AS component,
       v1 AS v1_micros,
       v2 AS v2_micros,
       (SELECT lambda1_micros FROM lam1) AS lambda1_micros,
       (SELECT lambda2_micros FROM lam2) AS lambda2_micros
FROM v8
