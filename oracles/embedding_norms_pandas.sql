SELECT vec_id,
       floor((sqrt(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0)) * 1000000.0 + 0.5) / 1000000.0 AS l2_norm
FROM (SELECT vec_id, embedding,
             unnest(generate_series(1, len(embedding))) AS i
      FROM embeddings)
GROUP BY vec_id
