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
), ed AS (
    SELECT doc_a, doc_b
    FROM inter
    JOIN sizes x ON doc_a = x.doc_id
    JOIN sizes y ON doc_b = y.doc_id
    WHERE floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5)
          / 1000000.0 >= 0.1
), und0 AS MATERIALIZED (
    SELECT doc_a, doc_b FROM ed
    UNION ALL
    SELECT doc_b AS doc_a, doc_a AS doc_b FROM ed
), deg1 AS MATERIALIZED (
    SELECT doc_a, count(*) AS d FROM und0 GROUP BY doc_a
), alive1 AS MATERIALIZED (
    SELECT doc_a FROM deg1 WHERE d >= 2
), und1 AS MATERIALIZED (
    SELECT u.doc_a, u.doc_b FROM und0 u
    JOIN alive1 x ON u.doc_a = x.doc_a
    JOIN alive1 y ON u.doc_b = y.doc_a
), deg2 AS MATERIALIZED (
    SELECT doc_a, count(*) AS d FROM und1 GROUP BY doc_a
), alive2 AS MATERIALIZED (
    SELECT doc_a FROM deg2 WHERE d >= 2
), und2 AS MATERIALIZED (
    SELECT u.doc_a, u.doc_b FROM und1 u
    JOIN alive2 x ON u.doc_a = x.doc_a
    JOIN alive2 y ON u.doc_b = y.doc_a
), deg3 AS MATERIALIZED (
    SELECT doc_a, count(*) AS d FROM und2 GROUP BY doc_a
), alive3 AS MATERIALIZED (
    SELECT doc_a FROM deg3 WHERE d >= 2
), und3 AS MATERIALIZED (
    SELECT u.doc_a, u.doc_b FROM und2 u
    JOIN alive3 x ON u.doc_a = x.doc_a
    JOIN alive3 y ON u.doc_b = y.doc_a
), deg4 AS MATERIALIZED (
    SELECT doc_a, count(*) AS d FROM und3 GROUP BY doc_a
), alive4 AS MATERIALIZED (
    SELECT doc_a FROM deg4 WHERE d >= 2
), und4 AS MATERIALIZED (
    SELECT u.doc_a, u.doc_b FROM und3 u
    JOIN alive4 x ON u.doc_a = x.doc_a
    JOIN alive4 y ON u.doc_b = y.doc_a
), deg5 AS MATERIALIZED (
    SELECT doc_a, count(*) AS d FROM und4 GROUP BY doc_a
), alive5 AS MATERIALIZED (
    SELECT doc_a FROM deg5 WHERE d >= 2
), und5 AS MATERIALIZED (
    SELECT u.doc_a, u.doc_b FROM und4 u
    JOIN alive5 x ON u.doc_a = x.doc_a
    JOIN alive5 y ON u.doc_b = y.doc_a
), deg6 AS MATERIALIZED (
    SELECT doc_a, count(*) AS d FROM und5 GROUP BY doc_a
), alive6 AS MATERIALIZED (
    SELECT doc_a FROM deg6 WHERE d >= 2
), und6 AS MATERIALIZED (
    SELECT u.doc_a, u.doc_b FROM und5 u
    JOIN alive6 x ON u.doc_a = x.doc_a
    JOIN alive6 y ON u.doc_b = y.doc_a
), deg7 AS MATERIALIZED (
    SELECT doc_a, count(*) AS d FROM und6 GROUP BY doc_a
), alive7 AS MATERIALIZED (
    SELECT doc_a FROM deg7 WHERE d >= 2
), und7 AS MATERIALIZED (
    SELECT u.doc_a, u.doc_b FROM und6 u
    JOIN alive7 x ON u.doc_a = x.doc_a
    JOIN alive7 y ON u.doc_b = y.doc_a
), deg8 AS MATERIALIZED (
    SELECT doc_a, count(*) AS d FROM und7 GROUP BY doc_a
), alive8 AS MATERIALIZED (
    SELECT doc_a FROM deg8 WHERE d >= 2
), und8 AS MATERIALIZED (
    SELECT u.doc_a, u.doc_b FROM und7 u
    JOIN alive8 x ON u.doc_a = x.doc_a
    JOIN alive8 y ON u.doc_b = y.doc_a
)
SELECT doc_a AS doc_id,
       CAST(count(*) AS BIGINT) AS core_degree
FROM und8 GROUP BY doc_a
