WITH     toks AS (
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
),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
        SELECT p.doc_a, p.doc_b, count(*) AS c
        FROM pairs p
        JOIN sh s1 ON s1.doc_id = p.doc_a
        JOIN sh s2 ON s2.doc_id = p.doc_b AND s2.shingle = s1.shingle
        GROUP BY 1, 2
    ), stf AS (
        SELECT doc_id, word, count(*) AS tf,
               ('0x' || substr(md5(word), 1, 4))::BIGINT AS h
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
              FROM documents)
        WHERE word <> '' GROUP BY doc_id, word
    ), votes AS (
        SELECT doc_id, j, sum(tf * (2 * ((h >> j) & 1) - 1)) AS s
        FROM stf CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) bits
        GROUP BY doc_id, j
    ), fps AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END)
                    AS BIGINT) AS simhash
        FROM votes GROUP BY doc_id
    )
    SELECT p.doc_a, p.doc_b,
           CAST(coalesce(i.c, 0) AS BIGINT) AS n_common,
           sa.n AS n_a, sb.n AS n_b,
           floor((coalesce(i.c, 0) * 1.0 / (sa.n + sb.n - coalesce(i.c, 0)))
                 * 1000000.0 + 0.5) / 1000000.0 AS jaccard,
           floor((coalesce(i.c, 0) * 1.0 / least(sa.n, sb.n))
                 * 1000000.0 + 0.5) / 1000000.0 AS containment,
           CAST(bit_count(xor(fa.simhash, fb.simhash)) AS BIGINT)
               AS simhash_hamming,
           floor((least(sa.n, sb.n) * 1.0 / greatest(sa.n, sb.n))
                 * 1000000.0 + 0.5) / 1000000.0 AS len_ratio
    FROM pairs p
    LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
    JOIN sizes sa ON sa.doc_id = p.doc_a
    JOIN sizes sb ON sb.doc_id = p.doc_b
    JOIN fps fa ON fa.doc_id = p.doc_a
    JOIN fps fb ON fb.doc_id = p.doc_b
