WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), p AS (
    SELECT toks[pos] || ' ' || toks[pos+1] AS pair
    FROM (SELECT toks,
                 unnest(generate_series(1, len(toks) - 1)) AS pos
          FROM t WHERE len(toks) >= 2)
), c AS (
    SELECT pair, count(*) AS n FROM p GROUP BY 1
)
SELECT pair, n,
       row_number() OVER (ORDER BY n DESC, pair) AS rank
FROM c
