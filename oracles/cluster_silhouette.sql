WITH cent AS (
    -- rounded per-label mean vectors: identical recipe to the
    -- ann_topk_ivf / label_centroids oracles (micro-quantized element
    -- sums -> mean -> grid round)
    SELECT label AS cell, pos,
           floor((CAST(sum(CAST(floor((CAST(embedding[pos] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS c
    FROM (SELECT label, embedding,
                 unnest(generate_series(1, 64)) AS pos
          FROM embeddings)
    GROUP BY 1, 2
), d2 AS (
    -- LONG micro-unit squared distance of every vector to every
    -- centroid (the _D2_FOLD_SQL contract)
    SELECT v.vec_id, v.label, c.cell,
           sum(CAST(floor((CAST(v.embedding[c.pos] AS DOUBLE) - c.c)
                     * (CAST(v.embedding[c.pos] AS DOUBLE) - c.c)
                     * 1000000.0 + 0.5) AS BIGINT)) AS d2m
    FROM embeddings v CROSS JOIN cent c
    GROUP BY 1, 2, 3
), ab AS (
    SELECT vec_id, label,
           sqrt(max(CASE WHEN cell = label THEN d2m END) / 1000000.0) AS a,
           sqrt(min(CASE WHEN cell <> label THEN d2m END) / 1000000.0) AS b
    FROM d2
    GROUP BY 1, 2
), s AS (
    SELECT label,
           -- b IS NULL = single distinct label (no other centroid):
           -- s defined as 0, mirroring the Spark expression
           CAST(floor((CASE WHEN b IS NULL THEN 0.0
                            WHEN greatest(a, b) = 0 THEN 0.0
                            ELSE (b - a) / greatest(a, b) END)
                      * 1000000.0 + 0.5) AS BIGINT) AS sm
    FROM ab
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       floor((CAST(sum(sm) AS DOUBLE) / 1000000.0 / count(*))
             * 1000000.0 + 0.5) / 1000000.0 AS mean_silhouette,
       CAST(sum(CASE WHEN sm < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
FROM s
GROUP BY label
