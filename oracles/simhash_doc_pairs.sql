WITH tf AS (
    SELECT doc_id, word, count(*) AS tf,
           ('0x' || substr(md5(word), 1, 4))::BIGINT AS h
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents)
    WHERE word <> '' GROUP BY doc_id, word
), votes AS (
    SELECT doc_id, j, sum(tf * (2 * ((h >> j) & 1) - 1)) AS s
    FROM tf CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) bits
    GROUP BY doc_id, j
), fp AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
), g AS (
    SELECT simhash, count(*) AS n FROM fp GROUP BY simhash
), vpairs AS MATERIALIZED (
    SELECT simhash AS fp_a, simhash AS fp_b FROM g WHERE n > 1
    UNION ALL
    SELECT a.simhash, b.simhash
    FROM g a JOIN g b ON a.simhash < b.simhash
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
)
SELECT least(a.doc_id, b.doc_id) AS doc_a,
       greatest(a.doc_id, b.doc_id) AS doc_b,
       CAST(bit_count(xor(v.fp_a, v.fp_b)) AS BIGINT) AS hamming
FROM vpairs v
JOIN fp a ON a.simhash = v.fp_a
JOIN fp b ON b.simhash = v.fp_b
WHERE v.fp_a < v.fp_b OR (v.fp_a = v.fp_b AND a.doc_id < b.doc_id)
