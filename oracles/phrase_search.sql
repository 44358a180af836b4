WITH t AS (
    SELECT doc_id, pos, t[pos] AS word
    FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS pos
          FROM (SELECT doc_id, string_split(text, ' ') AS t
                FROM documents))
)
SELECT a.doc_id, count(*) AS n_hits
FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.word = 'table' AND b.word = 'hash'
GROUP BY 1
