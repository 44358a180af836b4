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
), qprobe AS (
    -- each query probes its 2 nearest cells
    SELECT vec_id, cell FROM (
        SELECT vec_id, cell, row_number() OVER (
            PARTITION BY vec_id ORDER BY d2, cell) AS rn
        FROM dist WHERE vec_id < 5)
    WHERE rn <= 2
), pairs AS (
    SELECT qa.vec_id AS query_id, ca.vec_id AS cand_id,
           qa.cell AS cell, q.embedding AS q_emb,
           c2.embedding AS c_emb
    FROM qprobe qa
    JOIN assign ca ON qa.cell = ca.cell AND ca.vec_id <> qa.vec_id
    JOIN embeddings q ON q.vec_id = qa.vec_id
    JOIN embeddings c2 ON c2.vec_id = ca.vec_id
), sums AS (
    SELECT query_id, cand_id, cell,
           sum(CAST(floor(CAST(q_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS dot,
           sum(CAST(floor(CAST(q_emb[i] AS DOUBLE) * CAST(q_emb[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS qq,
           sum(CAST(floor(CAST(c_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS cc
    FROM (SELECT query_id, cand_id, cell, q_emb, c_emb,
                 unnest(generate_series(1, len(q_emb))) AS i
          FROM pairs)
    GROUP BY 1, 2, 3
), scored AS (
    SELECT query_id, cand_id, cell,
           floor((dot / (sqrt(qq) * sqrt(cc))) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
    FROM sums
)
SELECT query_id, cand_id, cell, cos_sim, rank FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, cand_id
    ) AS rank FROM scored
) WHERE rank <= 5
