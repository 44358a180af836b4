WITH tf AS (
    SELECT doc_id, word, count(*) AS tf
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents)
    WHERE word <> '' GROUP BY 1, 2
), n AS (
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens
    FROM tf GROUP BY 1
), t AS (
    SELECT tf.doc_id, n.n_tokens,
           CAST(floor((CAST(tf.tf AS DOUBLE) / n.n_tokens)
                      * ln(CAST(tf.tf AS DOUBLE) / n.n_tokens)
                      * 1000000.0 + 0.5) AS BIGINT) AS tm
    FROM tf JOIN n ON tf.doc_id = n.doc_id
)
SELECT doc_id, n_tokens,
       floor((-(CAST(sum(tm) AS DOUBLE) / 1000000.0))
             * 1000000.0 + 0.5) / 1000000.0 AS entropy
FROM t GROUP BY doc_id, n_tokens
