WITH scores AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN word IN ('der','die','das','und','ist') THEN 1 ELSE 0 END) AS BIGINT) AS score_de,
           CAST(sum(CASE WHEN word IN ('the','a','is','what','it','and') THEN 1 ELSE 0 END) AS BIGINT) AS score_en,
           CAST(sum(CASE WHEN word IN ('el','la','los','es','y') THEN 1 ELSE 0 END) AS BIGINT) AS score_es,
           CAST(sum(CASE WHEN word IN ('le','la','les','est','et') THEN 1 ELSE 0 END) AS BIGINT) AS score_fr,
           CAST(sum(CASE WHEN word IN ('的','是','了','在') THEN 1 ELSE 0 END) AS BIGINT) AS score_zh
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents)
    GROUP BY doc_id
)
SELECT doc_id,
       CASE WHEN score_de = m THEN 'de'
            WHEN score_en = m THEN 'en'
            WHEN score_es = m THEN 'es'
            WHEN score_fr = m THEN 'fr'
            ELSE 'zh' END AS pred_lang,
       m AS best_score
FROM (SELECT *, greatest(score_de, score_en, score_es, score_fr, score_zh) AS m
      FROM scores)
