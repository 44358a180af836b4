WITH q AS (
    SELECT vec_id AS query_id, embedding AS q_emb
    FROM embeddings WHERE vec_id < 5
), pairs AS (
    SELECT query_id, c.vec_id AS cand_id, q_emb, c.embedding AS c_emb
    FROM q CROSS JOIN embeddings c WHERE c.vec_id <> query_id
), sums AS (
    SELECT query_id, cand_id,
           sum(CAST(floor(CAST(q_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS dot,
           sum(CAST(floor(CAST(q_emb[i] AS DOUBLE) * CAST(q_emb[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS qq,
           sum(CAST(floor(CAST(c_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS cc
    FROM (SELECT query_id, cand_id, q_emb, c_emb,
                 unnest(generate_series(1, len(q_emb))) AS i
          FROM pairs)
    GROUP BY query_id, cand_id
), scored AS (
    SELECT query_id, cand_id,
           floor((dot / (sqrt(qq) * sqrt(cc))) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
    FROM sums
)
SELECT query_id, cand_id, cos_sim, rank FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, cand_id
    ) AS rank FROM scored
) WHERE rank <= 5
