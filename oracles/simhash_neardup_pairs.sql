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
)
-- value-level summary: all-pairs over DISTINCT fingerprints is
-- exact here; banding is recall-complete at hamming <= 3
-- (pigeonhole), so the Spark banded plan finds the same pairs
SELECT simhash AS fp_a, simhash AS fp_b,
       CAST(0 AS BIGINT) AS hamming,
       CAST(n * (n - 1) // 2 AS BIGINT) AS n_pairs
FROM g WHERE n > 1
UNION ALL
SELECT a.simhash AS fp_a, b.simhash AS fp_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming,
       CAST(a.n * b.n AS BIGINT) AS n_pairs
FROM g a JOIN g b ON a.simhash < b.simhash
WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
