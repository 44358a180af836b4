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
), ed AS MATERIALIZED (
    SELECT doc_a, doc_b FROM inter
    JOIN sizes x ON doc_a = x.doc_id
    JOIN sizes y ON doc_b = y.doc_id
    WHERE floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5)
          / 1000000.0 >= 0.1
), und AS MATERIALIZED (
    SELECT doc_a, doc_b FROM ed
    UNION ALL
    SELECT doc_b AS doc_a, doc_a AS doc_b FROM ed
), adj AS MATERIALIZED (
    SELECT doc_a AS node,
           list_sort(list(DISTINCT doc_b)) AS nbrs
    FROM und GROUP BY doc_a
), w0 AS MATERIALIZED (
    SELECT node, walk, node AS cur, [node] AS path
    FROM adj CROSS JOIN
         (SELECT unnest(generate_series(0, 1)) AS walk)
), w1 AS MATERIALIZED (
    SELECT w.node, w.walk,
           a.nbrs[1 + CAST(
               ('0x' || substr(md5(w.walk || ':' || 1
                                   || ':' || w.cur), 1, 8)
               )::BIGINT % len(a.nbrs) AS INT)] AS cur,
           list_append(w.path,
               a.nbrs[1 + CAST(
                   ('0x' || substr(md5(w.walk || ':' || 1
                                       || ':' || w.cur), 1, 8)
                   )::BIGINT % len(a.nbrs) AS INT)]) AS path
    FROM w0 w JOIN adj a ON a.node = w.cur
), w2 AS MATERIALIZED (
    SELECT w.node, w.walk,
           a.nbrs[1 + CAST(
               ('0x' || substr(md5(w.walk || ':' || 2
                                   || ':' || w.cur), 1, 8)
               )::BIGINT % len(a.nbrs) AS INT)] AS cur,
           list_append(w.path,
               a.nbrs[1 + CAST(
                   ('0x' || substr(md5(w.walk || ':' || 2
                                       || ':' || w.cur), 1, 8)
                   )::BIGINT % len(a.nbrs) AS INT)]) AS path
    FROM w1 w JOIN adj a ON a.node = w.cur
), w3 AS MATERIALIZED (
    SELECT w.node, w.walk,
           a.nbrs[1 + CAST(
               ('0x' || substr(md5(w.walk || ':' || 3
                                   || ':' || w.cur), 1, 8)
               )::BIGINT % len(a.nbrs) AS INT)] AS cur,
           list_append(w.path,
               a.nbrs[1 + CAST(
                   ('0x' || substr(md5(w.walk || ':' || 3
                                       || ':' || w.cur), 1, 8)
                   )::BIGINT % len(a.nbrs) AS INT)]) AS path
    FROM w2 w JOIN adj a ON a.node = w.cur
), adjpairs AS (
    SELECT path[i] AS a, path[i + 1] AS b
    FROM w3, unnest(generate_series(1, len(path) - 1)) AS t(i)
), bi AS (
    SELECT a AS center, b AS context FROM adjpairs
    UNION ALL
    SELECT b AS center, a AS context FROM adjpairs
)
SELECT center, context, count(*) AS n
FROM bi GROUP BY 1, 2
