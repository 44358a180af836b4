SELECT coalesce(nk_c, nk_s) AS nationkey, n_customers, n_suppliers
FROM (SELECT c_nationkey AS nk_c, count(*) AS n_customers
      FROM customer GROUP BY c_nationkey) c
FULL OUTER JOIN
     (SELECT s_nationkey AS nk_s, count(*) AS n_suppliers
      FROM supplier GROUP BY s_nationkey) s
  ON nk_c = nk_s
