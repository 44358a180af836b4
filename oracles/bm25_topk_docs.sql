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
    SELECT tf.doc_id, tf.word,
           -- identical op order and DOUBLE-cast literals as the
           -- bm25_top_terms oracle (bare 2.2 is DECIMAL in DuckDB)
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
), queries(query_id, word) AS (
    VALUES ('q_hash_join', 'hash'), ('q_hash_join', 'join'),
           ('q_sort_merge_join', 'sort'), ('q_sort_merge_join', 'merge'),
           ('q_sort_merge_join', 'join'),
           ('q_dup_scan', 'dup'), ('q_dup_scan', 'scan'),
           ('q_stream_window', 'stream'), ('q_stream_window', 'window')
), per_doc AS (
    SELECT q.query_id, s.doc_id,
           CAST(count(*) AS BIGINT) AS n_terms_hit,
           -- micro-unit integer accumulation: associative, so no
           -- summation-order hazard (the exact_sum contract)
           CAST(sum(CAST(floor(s.bm25 * 1000000.0 + 0.5) AS BIGINT))
                AS BIGINT) AS score_micros
    FROM scored s JOIN queries q USING (word)
    GROUP BY q.query_id, s.doc_id
)
SELECT query_id, doc_id, n_terms_hit,
       score_micros / 1000000.0 AS score,
       rk
FROM (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY score_micros DESC, doc_id
    ) AS BIGINT) AS rk
    FROM per_doc
) WHERE rk <= 5
