WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents
), tf AS (
    SELECT doc_id, word, count(*) AS tf FROM toks
    WHERE word <> '' GROUP BY doc_id, word
), df AS (
    SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY word
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.word, tf.tf, df.df,
           floor((tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df)) * 1000000.0 + 0.5) / 1000000.0 AS tfidf
    FROM tf JOIN df USING (word) CROSS JOIN n
)
SELECT doc_id, word, tf, df, tfidf, rk FROM (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, word
    ) AS rk FROM scored
) WHERE rk <= 3
