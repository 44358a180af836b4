-- reuses the bpe_encode_corpus unrolled merge chain (s0..s2),
-- rolled up per source instead of per document
WITH raw0 AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS tok,
           unnest(generate_series(1,
               len(string_split(text, ' ')))) AS p
    FROM documents
), s0 AS MATERIALIZED (
    SELECT doc_id,
           row_number() OVER (PARTITION BY doc_id ORDER BY p)
               AS pos,
           tok
    FROM raw0 WHERE tok <> ''
), pr1 AS MATERIALIZED (
    SELECT doc_id, pos, tok,
           lead(tok) OVER (PARTITION BY doc_id ORDER BY pos)
               AS nxt
    FROM s0
), cnt1 AS (
    SELECT tok || ' ' || nxt AS pair, count(*) AS pair_count
    FROM pr1 WHERE nxt IS NOT NULL GROUP BY 1
), top1 AS MATERIALIZED (
    SELECT pair, pair_count FROM cnt1
    ORDER BY pair_count DESC, pair LIMIT 1
), mt1 AS MATERIALIZED (
    SELECT p.doc_id, p.pos FROM pr1 p, top1 t
    WHERE p.tok || ' ' || p.nxt = t.pair
), run1 AS (
    SELECT doc_id, pos,
           sum(CASE WHEN prev = pos - 1 THEN 0 ELSE 1 END)
               OVER (PARTITION BY doc_id ORDER BY pos)
               AS run_id
    FROM (SELECT doc_id, pos,
                 lag(pos) OVER (PARTITION BY doc_id
                                ORDER BY pos) AS prev
          FROM mt1)
), st1 AS MATERIALIZED (
    SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
               min(pos) OVER (PARTITION BY doc_id, run_id)
                   AS rs
        FROM run1)
    WHERE (pos - rs) % 2 = 0
), s1 AS MATERIALIZED (
    SELECT p.doc_id,
           row_number() OVER (PARTITION BY p.doc_id
                              ORDER BY p.pos) AS pos,
           CASE WHEN st.pos IS NOT NULL
                THEN p.tok || '_' || p.nxt
                ELSE p.tok END AS tok
    FROM pr1 p
    LEFT JOIN st1 st
      ON st.doc_id = p.doc_id AND st.pos = p.pos
    WHERE NOT EXISTS (
        SELECT 1 FROM st1 c
        WHERE c.doc_id = p.doc_id AND c.pos = p.pos - 1)
), pr2 AS MATERIALIZED (
    SELECT doc_id, pos, tok,
           lead(tok) OVER (PARTITION BY doc_id ORDER BY pos)
               AS nxt
    FROM s1
), cnt2 AS (
    SELECT tok || ' ' || nxt AS pair, count(*) AS pair_count
    FROM pr2 WHERE nxt IS NOT NULL GROUP BY 1
), top2 AS MATERIALIZED (
    SELECT pair, pair_count FROM cnt2
    ORDER BY pair_count DESC, pair LIMIT 1
), mt2 AS MATERIALIZED (
    SELECT p.doc_id, p.pos FROM pr2 p, top2 t
    WHERE p.tok || ' ' || p.nxt = t.pair
), run2 AS (
    SELECT doc_id, pos,
           sum(CASE WHEN prev = pos - 1 THEN 0 ELSE 1 END)
               OVER (PARTITION BY doc_id ORDER BY pos)
               AS run_id
    FROM (SELECT doc_id, pos,
                 lag(pos) OVER (PARTITION BY doc_id
                                ORDER BY pos) AS prev
          FROM mt2)
), st2 AS MATERIALIZED (
    SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
               min(pos) OVER (PARTITION BY doc_id, run_id)
                   AS rs
        FROM run2)
    WHERE (pos - rs) % 2 = 0
), s2 AS MATERIALIZED (
    SELECT p.doc_id,
           row_number() OVER (PARTITION BY p.doc_id
                              ORDER BY p.pos) AS pos,
           CASE WHEN st.pos IS NOT NULL
                THEN p.tok || '_' || p.nxt
                ELSE p.tok END AS tok
    FROM pr2 p
    LEFT JOIN st2 st
      ON st.doc_id = p.doc_id AND st.pos = p.pos
    WHERE NOT EXISTS (
        SELECT 1 FROM st2 c
        WHERE c.doc_id = p.doc_id AND c.pos = p.pos - 1)
)
, before AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_before
    FROM s0 GROUP BY doc_id
), afterc AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_after
    FROM s2 GROUP BY doc_id
), agg AS (
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(b.n_before) AS BIGINT) AS words_before,
           CAST(sum(a.n_after) AS BIGINT) AS tokens_after
    FROM before b
    JOIN afterc a USING (doc_id)
    JOIN documents d USING (doc_id)
    GROUP BY d.source
)
SELECT source, n_docs, words_before, tokens_after,
       CAST(words_before - tokens_after AS BIGINT) AS merges_applied,
       -- BIGINT / BIGINT is IEEE double division in DuckDB exactly as
       -- long / long is in Spark; 1.0 meets the DOUBLE quotient
       floor((CAST(1.0 AS DOUBLE) - tokens_after / words_before)
             * 1000000.0 + 0.5) / 1000000.0 AS compression
FROM agg
