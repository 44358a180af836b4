"""Property-based tests (hypothesis) over in-memory corpora: operator
invariants that must hold for ANY input, not just the fixtures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from geektime_bigdata_spark.functions import shingles, tokens

WORDS = st.sampled_from(["a", "bb", "ccc", "dd", "e", "fff", "gg"])
DOC = st.lists(WORDS, min_size=0, max_size=12).map(" ".join)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(DOC, min_size=1, max_size=6))
def test_inverted_index_roundtrip(spark, texts):
    """Every (word, doc) posting must correspond to the word actually
    appearing in that doc, and cover all occurrences."""
    df = _docs_df(spark, texts)
    postings = (
        df.select("doc_id", F.explode_outer(tokens()).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("docs"))
        .collect()
    )
    for r in postings:
        for d in r["docs"]:
            assert r["word"] in texts[d].split(" ")
    # completeness: every token of every doc is indexed
    indexed = {r["word"] for r in postings}
    for t in texts:
        for w in t.split(" "):
            if w:
                assert w in indexed


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(DOC, min_size=1, max_size=6))
def test_shingle_count_invariant(spark, texts):
    """A doc with n>=3 tokens has between 1 and n-2 distinct 3-shingles;
    fewer tokens -> zero shingles."""
    df = _docs_df(spark, texts).select(
        "doc_id", tokens().alias("toks")
    ).select("doc_id", F.size("toks").alias("n"), shingles().alias("sh"))
    for r in df.collect():
        if r["n"] >= 3:
            assert 1 <= len(r["sh"]) <= r["n"] - 2
        else:
            assert r["sh"] == []


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=1,
        max_size=20,
    )
)
def test_running_sum_last_equals_total(spark, vals):
    """The final row of a cumulative window equals the plain sum."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "i int, v double"
    )
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    last = (
        df.select(F.sum("v").over(w).alias("run"), "i")
        .orderBy(F.col("i").desc())
        .first()["run"]
    )
    total = df.agg(F.sum("v")).first()[0]
    assert abs(last - total) < 1e-9


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),
        min_size=1,
        max_size=30,
    )
)
def test_exact_dedup_partitions_input(spark, rows):
    """Dedup groups partition the input: group sizes sum to row count and
    each keeper is the min id of its group."""
    df = spark.createDataFrame(
        [(i, f"text-{k}") for i, (k, _) in enumerate(rows)],
        "doc_id int, text string",
    )
    groups = (
        df.select(F.md5("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep"), F.count("*").alias("n"))
        .collect()
    )
    assert sum(g["n"] for g in groups) == len(rows)
    by_text = {}
    for i, (k, _) in enumerate(rows):
        by_text.setdefault(f"text-{k}", []).append(i)
    keeps = {min(v) for v in by_text.values()}
    assert {g["keep"] for g in groups} == keeps
