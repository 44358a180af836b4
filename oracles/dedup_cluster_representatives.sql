WITH RECURSIVE toks AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS (
    SELECT DISTINCT doc_id,
           toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
    FROM (SELECT doc_id, toks,
                 unnest(generate_series(1, len(toks) - 2)) AS pos
          FROM toks)
), sizes AS (
    SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
    FROM sh a JOIN sh b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
), edges AS (
    SELECT doc_a, doc_b FROM inter
    JOIN sizes x ON doc_a = x.doc_id
    JOIN sizes y ON doc_b = y.doc_id
    WHERE floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5) / 1000000.0 >= 0.1
), bidir AS (
    SELECT doc_a AS s, doc_b AS d FROM edges
    UNION SELECT doc_b, doc_a FROM edges
), deg AS (
    SELECT s AS src, count(*) AS deg FROM bidir GROUP BY 1
), n AS (SELECT count(*) AS n_docs FROM documents),
r0 AS (
    SELECT doc_id,
           floor((1.0 / n.n_docs) * 1000000000.0 + 0.5)
               / 1000000000.0 AS pr
    FROM documents CROSS JOIN n
), r1 AS (
    SELECT d0.doc_id,
           floor(((0.15 / n.n_docs)
                  + (0.85 * (coalesce(s.m, 0) / 1000000000.0)))
                 * 1000000000.0 + 0.5) / 1000000000.0 AS pr
    FROM documents d0 CROSS JOIN n
    LEFT JOIN (
        SELECT b.d AS dst,
               sum(CAST(floor((r.pr / g.deg)
                              * 1000000000.0 + 0.5) AS BIGINT))
                   AS m
        FROM bidir b
        JOIN r0 r ON r.doc_id = b.s
        JOIN deg g ON g.src = b.s
        GROUP BY 1) s ON s.dst = d0.doc_id
), r2 AS (
    SELECT d0.doc_id,
           floor(((0.15 / n.n_docs)
                  + (0.85 * (coalesce(s.m, 0) / 1000000000.0)))
                 * 1000000000.0 + 0.5) / 1000000000.0 AS pr
    FROM documents d0 CROSS JOIN n
    LEFT JOIN (
        SELECT b.d AS dst,
               sum(CAST(floor((r.pr / g.deg)
                              * 1000000000.0 + 0.5) AS BIGINT))
                   AS m
        FROM bidir b
        JOIN r1 r ON r.doc_id = b.s
        JOIN deg g ON g.src = b.s
        GROUP BY 1) s ON s.dst = d0.doc_id
), r3 AS (
    SELECT d0.doc_id,
           floor(((0.15 / n.n_docs)
                  + (0.85 * (coalesce(s.m, 0) / 1000000000.0)))
                 * 1000000000.0 + 0.5) / 1000000000.0 AS pr
    FROM documents d0 CROSS JOIN n
    LEFT JOIN (
        SELECT b.d AS dst,
               sum(CAST(floor((r.pr / g.deg)
                              * 1000000000.0 + 0.5) AS BIGINT))
                   AS m
        FROM bidir b
        JOIN r2 r ON r.doc_id = b.s
        JOIN deg g ON g.src = b.s
        GROUP BY 1) s ON s.dst = d0.doc_id
), r4 AS (
    SELECT d0.doc_id,
           floor(((0.15 / n.n_docs)
                  + (0.85 * (coalesce(s.m, 0) / 1000000000.0)))
                 * 1000000000.0 + 0.5) / 1000000000.0 AS pr
    FROM documents d0 CROSS JOIN n
    LEFT JOIN (
        SELECT b.d AS dst,
               sum(CAST(floor((r.pr / g.deg)
                              * 1000000000.0 + 0.5) AS BIGINT))
                   AS m
        FROM bidir b
        JOIN r3 r ON r.doc_id = b.s
        JOIN deg g ON g.src = b.s
        GROUP BY 1) s ON s.dst = d0.doc_id
), r5 AS (
    SELECT d0.doc_id,
           floor(((0.15 / n.n_docs)
                  + (0.85 * (coalesce(s.m, 0) / 1000000000.0)))
                 * 1000000000.0 + 0.5) / 1000000000.0 AS pr
    FROM documents d0 CROSS JOIN n
    LEFT JOIN (
        SELECT b.d AS dst,
               sum(CAST(floor((r.pr / g.deg)
                              * 1000000000.0 + 0.5) AS BIGINT))
                   AS m
        FROM bidir b
        JOIN r4 r ON r.doc_id = b.s
        JOIN deg g ON g.src = b.s
        GROUP BY 1) s ON s.dst = d0.doc_id
)
, walk(doc, reach) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT w.doc, b2.d FROM walk w JOIN bidir b2 ON w.reach = b2.s
), cc AS (
    SELECT doc AS doc_id, min(reach) AS cluster_id
    FROM walk GROUP BY doc
), joined AS (
    SELECT cc.cluster_id, r5.doc_id, r5.pr
    FROM cc JOIN r5 USING (doc_id)
)
SELECT cluster_id, doc_id AS rep_doc_id, pr AS rep_pagerank,
       n_members
FROM (
    SELECT cluster_id, doc_id, pr,
           count(*) OVER (PARTITION BY cluster_id) AS n_members,
           row_number() OVER (
               PARTITION BY cluster_id ORDER BY pr DESC, doc_id
           ) AS rn
    FROM joined)
WHERE rn = 1
