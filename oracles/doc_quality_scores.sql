WITH tok AS (
    SELECT doc_id,
           count(*) AS n_tokens,
           floor((CAST(sum(length(word)) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_word_len,
           floor((CAST(sum(CASE WHEN word IN ('the','a','is','what','it','and','of','to','in')
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS stopword_ratio,
           floor((count(DISTINCT word) * 1.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS distinct_ratio
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents)
    GROUP BY doc_id
)
SELECT d.doc_id, length(d.text) AS n_chars_text,
       t.n_tokens, t.avg_word_len, t.stopword_ratio, t.distinct_ratio,
       floor((least(t.n_tokens / 100.0, 1.0) * 0.4
             + t.distinct_ratio * 0.4
             + (1 - t.stopword_ratio) * 0.2) * 1000000.0 + 0.5) / 1000000.0 AS quality_score
FROM documents d JOIN tok t ON d.doc_id = t.doc_id
