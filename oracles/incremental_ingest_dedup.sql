WITH k AS (
    SELECT doc_id, source,
           md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS fp
    FROM documents
), inc AS (
    SELECT doc_id, fp,
           min(doc_id) OVER (PARTITION BY fp) AS first_in_batch
    FROM k WHERE source = 'src0'
), ex AS (SELECT DISTINCT fp FROM k WHERE source <> 'src0')
SELECT doc_id, fp,
       CASE WHEN fp IN (SELECT fp FROM ex) THEN 'dup_existing'
            WHEN doc_id <> first_in_batch THEN 'dup_in_batch'
            ELSE 'new' END AS status
FROM inc
