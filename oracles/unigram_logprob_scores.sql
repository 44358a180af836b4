WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents
), t AS (SELECT doc_id, word FROM toks WHERE word <> ''),
freq AS (
    SELECT word, count(*) AS cnt FROM t GROUP BY word
), total AS (SELECT count(*) AS tot FROM t)
SELECT doc_id,
       count(*) AS n_tokens,
       floor(((CAST(sum(CAST(floor(ln(cnt * 1.0 / total.tot) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_logprob
FROM t JOIN freq USING (word) CROSS JOIN total
GROUP BY doc_id
