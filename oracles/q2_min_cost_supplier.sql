WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
cand AS (
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           min(s_acctbal) OVER (PARTITION BY p_partkey) AS min_bal
    FROM ps
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_size <= 5 AND p_type = 'LARGE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM cand WHERE s_acctbal = min_bal
ORDER BY s_acctbal DESC, p_partkey, s_name
LIMIT 100
