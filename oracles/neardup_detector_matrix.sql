-- composed from the five family oracle files by
-- tools-free string assembly; regenerate if any family oracle changes
WITH u AS MATERIALIZED (
    SELECT DISTINCT 'edit' AS family, doc_a, doc_b FROM (
        WITH d AS (
            SELECT doc_id,
                   substring(text, 1, 16) AS blk,
                   substring(text, 1, 64) AS head
            FROM documents
        ), ok AS MATERIALIZED (
            SELECT blk FROM d GROUP BY blk
            HAVING count(*) BETWEEN 2 AND 64
        ), blocked AS MATERIALIZED (
            SELECT d.doc_id, d.blk, d.head FROM d JOIN ok USING (blk)
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist
        FROM blocked a JOIN blocked b
          ON a.blk = b.blk AND a.doc_id < b.doc_id
        WHERE levenshtein(a.head, b.head) <= 24
    )
    UNION ALL
    SELECT DISTINCT 'edit_snm' AS family, doc_a, doc_b FROM (
        WITH d AS (
            SELECT doc_id, substring(text, 1, 64) AS head,
                   reverse(substring(text, 1, 64)) AS skey
            FROM documents
        ), r AS MATERIALIZED (
            SELECT doc_id, head, skey,
                   substring(skey, 1, 2) AS blk,
                   row_number() OVER (PARTITION BY substring(skey, 1, 2)
                                      ORDER BY skey, doc_id) AS rn
            FROM d
        )
        SELECT least(a.doc_id, b.doc_id) AS doc_a,
               greatest(a.doc_id, b.doc_id) AS doc_b,
               CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist
        FROM r a JOIN r b
          ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 8
        WHERE levenshtein(a.head, b.head) <= 24
    )
    UNION ALL
    SELECT DISTINCT 'jaccard' AS family, doc_a, doc_b FROM (
        WITH toks AS (
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
        )
        SELECT doc_a, doc_b,
               floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
        FROM inter
        JOIN sizes x ON doc_a = x.doc_id
        JOIN sizes y ON doc_b = y.doc_id
        WHERE floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5) / 1000000.0 >= 0.1
    )
    UNION ALL
    SELECT DISTINCT 'lsh' AS family, doc_a, doc_b FROM (
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
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    )
    UNION ALL
    SELECT DISTINCT 'winnow' AS family, doc_a, doc_b FROM (
        WITH pos AS (
            SELECT doc_id, text,
                   unnest(generate_series(1, length(text) - 15)) AS p
            FROM documents WHERE length(text) >= 16
        ), h AS (
            SELECT doc_id, CAST((p - 1) // 8 AS BIGINT) AS block,
                   ('0x' || substr(md5(substring(text, p, 16)), 1, 8))::BIGINT AS hv
            FROM pos
        ), fp AS MATERIALIZED (
            SELECT DISTINCT doc_id, fp FROM (
                SELECT doc_id, block, min(hv) AS fp
                FROM h GROUP BY 1, 2)
        ), rare AS MATERIALIZED (
            SELECT doc_id, fp FROM fp
            WHERE fp IN (
                SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 64)
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS n_shared
        FROM rare a JOIN rare b
          ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= 3
    )
)
SELECT a.family AS family_a, b.family AS family_b,
       count(*) AS n_common
FROM u a JOIN u b ON a.doc_a = b.doc_a AND a.doc_b = b.doc_b
GROUP BY 1, 2
