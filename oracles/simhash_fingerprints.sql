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
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
