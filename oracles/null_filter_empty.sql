SELECT c_name FROM (
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE c_acctbal > 18 AND c_custkey <> NULL
) WHERE c_acctbal < 35
