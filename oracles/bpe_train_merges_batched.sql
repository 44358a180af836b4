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
    SELECT tok AS l, nxt AS r, count(*) AS pair_count
    FROM pr1 WHERE nxt IS NOT NULL GROUP BY 1, 2
), rk1 AS MATERIALIZED (
    SELECT l, r, pair_count,
           l || ' ' || r AS pair, l || '_' || r AS m,
           row_number() OVER (ORDER BY pair_count DESC, l || ' ' || r)
               AS rn
    FROM cnt1
    ORDER BY pair_count DESC, pair LIMIT 4
), kp1 AS MATERIALIZED (
    SELECT a.l, a.r, a.pair, a.pair_count,
           row_number() OVER (ORDER BY a.pair_count DESC, a.pair)
               AS merge_rank
    FROM rk1 a
    WHERE NOT EXISTS (
        SELECT 1 FROM rk1 b WHERE b.rn < a.rn AND (
            a.l IN (b.l, b.r, b.m) OR
            a.r IN (b.l, b.r, b.m) OR
            a.m IN (b.l, b.r, b.m)))
), mt1 AS MATERIALIZED (
    SELECT p.doc_id, p.pos FROM pr1 p
    JOIN kp1 k ON p.tok = k.l AND p.nxt = k.r
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
    SELECT tok AS l, nxt AS r, count(*) AS pair_count
    FROM pr2 WHERE nxt IS NOT NULL GROUP BY 1, 2
), rk2 AS MATERIALIZED (
    SELECT l, r, pair_count,
           l || ' ' || r AS pair, l || '_' || r AS m,
           row_number() OVER (ORDER BY pair_count DESC, l || ' ' || r)
               AS rn
    FROM cnt2
    ORDER BY pair_count DESC, pair LIMIT 4
), kp2 AS MATERIALIZED (
    SELECT a.l, a.r, a.pair, a.pair_count,
           row_number() OVER (ORDER BY a.pair_count DESC, a.pair)
               AS merge_rank
    FROM rk2 a
    WHERE NOT EXISTS (
        SELECT 1 FROM rk2 b WHERE b.rn < a.rn AND (
            a.l IN (b.l, b.r, b.m) OR
            a.r IN (b.l, b.r, b.m) OR
            a.m IN (b.l, b.r, b.m)))
), mt2 AS MATERIALIZED (
    SELECT p.doc_id, p.pos FROM pr2 p
    JOIN kp2 k ON p.tok = k.l AND p.nxt = k.r
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
SELECT CAST(1 AS BIGINT) AS step,
       CAST(merge_rank AS BIGINT) AS merge_rank,
       pair, pair_count,
       (SELECT count(*) FROM s1) AS n_tokens_after
FROM kp1
UNION ALL
SELECT CAST(2 AS BIGINT) AS step,
       CAST(merge_rank AS BIGINT) AS merge_rank,
       pair, pair_count,
       (SELECT count(*) FROM s2) AS n_tokens_after
FROM kp2
