WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS (
    SELECT DISTINCT doc_id,
           toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
    FROM (SELECT doc_id, toks,
                 unnest(generate_series(1, len(toks) - 2)) AS pos
          FROM toks)
), seeds AS (SELECT unnest(generate_series(0, 11)) AS seed),
mh AS (
    SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS mh
    FROM sh CROSS JOIN seeds GROUP BY doc_id, seed
), bands AS (
    SELECT doc_id, seed // 3 AS band,
           md5(string_agg(mh, '' ORDER BY seed)) AS sig
    FROM mh GROUP BY doc_id, seed // 3
), pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
), eq AS (
    SELECT p.doc_a, p.doc_b,
           CAST(sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END)
                AS BIGINT) AS n_eq
    FROM pairs p
    JOIN mh x ON x.doc_id = p.doc_a
    JOIN mh y ON y.doc_id = p.doc_b AND y.seed = x.seed
    GROUP BY 1, 2
), sizes AS (
    SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
), inter AS (
    SELECT p.doc_a, p.doc_b, count(*) AS c
    FROM pairs p
    JOIN sh s1 ON s1.doc_id = p.doc_a
    JOIN sh s2 ON s2.doc_id = p.doc_b
              AND s2.shingle = s1.shingle
    GROUP BY 1, 2
), m AS (
    SELECT e.doc_a, e.doc_b, e.n_eq,
           floor((e.n_eq / 12) * 1000000.0 + 0.5) / 1000000.0
               AS est_jaccard,
           floor((CAST(coalesce(i.c, 0) AS BIGINT)
                  / (sa.n + sb.n - coalesce(i.c, 0)))
                 * 1000000.0 + 0.5) / 1000000.0 AS exact_jaccard
    FROM eq e
    LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
    JOIN sizes sa ON sa.doc_id = e.doc_a
    JOIN sizes sb ON sb.doc_id = e.doc_b
)
SELECT doc_a, doc_b, n_eq, est_jaccard, exact_jaccard,
       floor(abs(est_jaccard - exact_jaccard) * 1000000.0 + 0.5)
           / 1000000.0 AS abs_err
FROM m
