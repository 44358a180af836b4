"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps each
implemented operator (SURVEY.md §2 + extensions) to a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` gives the DuckDB
twin for the driver's differential correctness check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from geektime_bigdata_spark.operators import relational, text

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.flow_stats(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        # --- relational core (homework-1/-2/-3/-5 parity) ---
        "flow_stats": relational.flow_stats,
        "null_filter_empty": relational.null_filter_empty,
        "cast_filter": relational.cast_filter,
        "const_score_order": relational.const_score_order,
        "distinct_pairs": relational.distinct_pairs,
        "except_anti": relational.except_anti,
        "student_q2": relational.student_q2,
        "prefix_scan_desc": relational.prefix_scan_desc,
        "point_lookup": relational.point_lookup,
        # --- text / inverted index (homework-4 parity) ---
        "term_freq": text.term_freq,
        "inverted_index_str": text.inverted_index_str,
        "posting_list_tf_str": text.posting_list_tf_str,
        "word_counts": text.word_counts,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins; column names/aliases match queries()."""
    return {
        "flow_stats": """
            SELECT user_id,
                   round(sum(CASE WHEN event_type = 'click' THEN value ELSE 0 END), 6) AS sum_up,
                   round(sum(CASE WHEN event_type = 'view' THEN value ELSE 0 END), 6) AS sum_down,
                   round(sum(CASE WHEN event_type IN ('click','view') THEN value ELSE 0 END), 6) AS sum_total
            FROM events GROUP BY user_id
        """,
        "null_filter_empty": """
            SELECT c_name FROM (
                SELECT c_custkey, c_name, c_acctbal FROM customer
                WHERE c_acctbal > 18 AND c_custkey <> NULL
            ) WHERE c_acctbal < 35
        """,
        "cast_filter": """
            SELECT CAST(c_custkey AS VARCHAR) AS id, c_name FROM customer
            WHERE CAST(CAST(c_custkey AS VARCHAR) AS INTEGER) > 100
        """,
        "const_score_order": """
            SELECT c_custkey, c_name, CAST(100 - 10 AS INTEGER) AS score
            FROM customer ORDER BY score, c_custkey
        """,
        "distinct_pairs": """
            SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
        """,
        "except_anti": """
            SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 0
            EXCEPT
            SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
        """,
        "student_q2": """
            SELECT id, name, CAST(100 - 10 AS INTEGER) AS score FROM (
                SELECT c_custkey AS id, c_name AS name FROM customer WHERE c_acctbal > 18
                EXCEPT
                SELECT DISTINCT c_custkey AS id, c_name AS name FROM customer
                WHERE c_mktsegment = 'BUILDING'
            ) WHERE CAST(id AS INTEGER) > 100 ORDER BY score, id
        """,
        "prefix_scan_desc": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE c_name LIKE 'Customer#00000001%'
            ORDER BY c_name DESC
        """,
        "point_lookup": """
            SELECT c_custkey, c_name FROM customer WHERE c_custkey = 42
        """,
        "term_freq": """
            SELECT word, doc_id, count(*) AS tf FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
            ) WHERE word <> '' GROUP BY word, doc_id
        """,
        "inverted_index_str": """
            SELECT word,
                   array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS doc_ids,
                   count(DISTINCT doc_id) AS df
            FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
            ) WHERE word <> '' GROUP BY word
        """,
        "posting_list_tf_str": """
            SELECT word,
                   string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id, tf) AS postings,
                   CAST(sum(tf) AS BIGINT) AS total_tf
            FROM (
                SELECT word, doc_id, count(*) AS tf FROM (
                    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
                ) WHERE word <> '' GROUP BY word, doc_id
            ) GROUP BY word
        """,
        "word_counts": """
            SELECT word, count(*) AS cnt FROM (
                SELECT unnest(string_split(text, ' ')) AS word FROM documents
            ) WHERE word <> '' GROUP BY word
        """,
    }
