WITH v AS (
    SELECT DISTINCT source, token
    FROM (SELECT source,
                 unnest(string_split(text, ' ')) AS token
          FROM documents)
), sizes AS (
    SELECT source, count(*) AS n FROM v GROUP BY 1
), pairs AS (
    SELECT a.source AS src_a, b.source AS src_b, count(*) AS c
    FROM v a JOIN v b
      ON a.token = b.token AND a.source < b.source
    GROUP BY 1, 2
)
SELECT src_a, src_b, sa.n AS n_a, sb.n AS n_b, c,
       CAST(floor(c / (sa.n + sb.n - c) * 1000000.0 + 0.5)
            / 1000000.0 AS DOUBLE) AS jaccard
FROM pairs
JOIN sizes sa ON pairs.src_a = sa.source
JOIN sizes sb ON pairs.src_b = sb.source
