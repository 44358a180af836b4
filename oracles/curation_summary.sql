WITH RECURSIVE toks AS (
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
), edges AS (
    SELECT doc_a, doc_b FROM inter
    JOIN sizes x ON doc_a = x.doc_id
    JOIN sizes y ON doc_b = y.doc_id
    WHERE floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5) / 1000000.0 >= 0.1
), bidir AS (
    SELECT doc_a AS s, doc_b AS d FROM edges
    UNION SELECT doc_b, doc_a FROM edges
), walk(doc, reach) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT w.doc, b.d FROM walk w JOIN bidir b ON w.reach = b.s
), clusters AS (
    SELECT doc AS doc_id, min(reach) AS cluster_id
    FROM walk GROUP BY doc
), tok AS (
    SELECT doc_id,
           count(*) AS n_tokens,
           floor((CAST(sum(CASE WHEN word IN ('the','a','is','what','it','and','of','to','in')
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS stopword_ratio,
           floor((count(DISTINCT word) * 1.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS distinct_ratio
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents)
    WHERE word <> '' GROUP BY doc_id
), quality AS (
    SELECT doc_id,
           floor((least(n_tokens / 100.0, 1.0) * 0.4
                 + distinct_ratio * 0.4
                 + (1 - stopword_ratio) * 0.2) * 1000000.0 + 0.5) / 1000000.0 AS quality_score
    FROM tok
), curated AS (
    SELECT d.doc_id, d.lang, cl.cluster_id,
           CAST(d.doc_id = cl.cluster_id AS INTEGER) AS is_representative,
           q.quality_score,
           CAST(d.doc_id = cl.cluster_id AND q.quality_score >= 0.5
                AS INTEGER) AS keep
    FROM documents d
    JOIN quality q ON d.doc_id = q.doc_id
    JOIN clusters cl ON d.doc_id = cl.doc_id
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(keep) AS BIGINT) AS n_kept,
       CAST(sum(1 - is_representative) AS BIGINT) AS n_dup_dropped,
       floor((CAST(sum(CAST(floor((CASE WHEN keep = 1 THEN quality_score END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(CASE WHEN keep = 1 THEN quality_score END)) * 1000000.0 + 0.5) / 1000000.0 AS kept_avg_quality
FROM curated GROUP BY lang
