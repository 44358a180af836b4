WITH wn AS (
    SELECT word FROM (
        SELECT unnest(string_split(text, ' ')) AS word
        FROM documents)
    WHERE word <> ''
), topk AS (
    SELECT word FROM (
        SELECT word, count(*) AS c FROM wn GROUP BY 1
        ORDER BY c DESC, word LIMIT 20)
)
SELECT count(*) AS n_tokens,
       CAST(sum(CASE WHEN word IN (SELECT word FROM topk)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
       floor((sum(CASE WHEN word IN (SELECT word FROM topk)
                      THEN 1 ELSE 0 END) * 1.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0
           AS coverage
FROM wn
