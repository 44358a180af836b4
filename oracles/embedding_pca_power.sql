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
    FROM g JOIN v0 v ON g.j = v.j GROUP BY g.i
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
    FROM g JOIN v1 v ON g.j = v.j GROUP BY g.i
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
    FROM g JOIN v2 v ON g.j = v.j GROUP BY g.i
), m3 AS (
    SELECT CAST(sum(CAST(floor((w_micros / 1e6) * (w_micros / 1e6)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS n2_micros
    FROM w3
), v3 AS MATERIALIZED (
    SELECT i AS j,
           CAST(floor((w_micros / 1e6) / sqrt(n2_micros / 1e6)
                * 1e6 + 0.5) AS BIGINT) AS v_micros
    FROM w3, m3
)
SELECT v3.j AS component, v3.v_micros,
       (SELECT CAST(floor(sqrt(n2_micros / 1e6) * 1e6 + 0.5) AS BIGINT)
        FROM m3) AS lambda_micros
FROM v3
