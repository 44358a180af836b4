WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents
), tf AS (
    SELECT doc_id, word, count(*) AS tf FROM toks
    WHERE word <> '' GROUP BY doc_id, word
), dl AS (
    SELECT doc_id, count(*) AS dl FROM toks
    WHERE word <> '' GROUP BY doc_id
), df AS (
    SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY word
), n AS (SELECT count(*) AS n_docs FROM documents),
avg_t AS (
    SELECT CAST(sum(dl) AS BIGINT) / count(*) AS avgdl FROM dl
), scored AS (
    SELECT tf.doc_id, tf.word, tf.tf, df.df, dl.dl,
           -- every fractional literal cast to DOUBLE: a bare
           -- 2.2 is DECIMAL in DuckDB and BIGINT*DECIMAL stays
           -- exact-decimal, off the IEEE product by 1 ulp for
           -- odd tf (ADVICE r2) — Spark computes doubles
           floor(((ln((CAST(n.n_docs AS DOUBLE) - df.df + 0.5)
                      / (df.df + 0.5) + 1.0)
                   * (tf.tf * CAST(2.2 AS DOUBLE)))
                  / (tf.tf + CAST(1.2 AS DOUBLE)
                     * (0.25 + (CAST(0.75 AS DOUBLE) * dl.dl)
                               / avg_t.avgdl)))
                 * 1000000.0 + 0.5) / 1000000.0 AS bm25
    FROM tf
    JOIN df USING (word)
    JOIN dl USING (doc_id)
    CROSS JOIN n CROSS JOIN avg_t
)
SELECT doc_id, word, tf, df, dl, bm25, rk FROM (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY bm25 DESC, word
    ) AS rk FROM scored
) WHERE rk <= 3
