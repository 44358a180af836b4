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
), assign AS (
    SELECT vec_id, cell FROM (
        SELECT vec_id, cell, row_number() OVER (
            PARTITION BY vec_id ORDER BY d2, cell) AS rn
        FROM dist)
    WHERE rn = 1
)
SELECT vec_id, cell, rk FROM (
    SELECT vec_id, cell, row_number() OVER (
        PARTITION BY cell
        ORDER BY md5('bal:' || CAST(vec_id AS VARCHAR)), vec_id
    ) AS rk
    FROM assign
) WHERE rk <= 30
