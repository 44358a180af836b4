"""End-to-end curation pipeline: the composite job a training-data run
actually executes, chaining the engine's pieces —

    quality scoring -> near-dup clustering -> representative selection
    -> corpus statistics

Demonstrates that the operators compose as DataFrames (one lazy plan; the
only materialization is inside the iterative clustering step) and stays
oracle-checkable end-to-end because every stage is deterministic.

Scale notes: quality scores and cluster labels are both (doc_id -> value)
relations; the final joins are on the corpus key and would be bucketed in
a persisted deployment. Kept docs = cluster representatives (min doc_id)
above the quality threshold — the standard "keep one per duplicate
cluster, drop low-quality" policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geektime_bigdata_spark.functions import exact_sum, grid_round
from geektime_bigdata_spark.operators.dedup import dedup_clusters
from geektime_bigdata_spark.operators.textstats import doc_quality_scores
from geektime_bigdata_spark.registry import table

QUALITY_THRESHOLD = 0.5


def curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keep/drop decision with the reasons: cluster id,
    whether the doc is its cluster's representative, quality score, and
    the final keep flag."""
    docs = table(spark, sf_dir, "documents")
    quality = doc_quality_scores(spark, sf_dir).select(
        "doc_id", "quality_score"
    )
    clusters = dedup_clusters(spark, sf_dir)
    rep = F.col("doc_id") == F.col("cluster_id")
    return (
        docs.select("doc_id", "lang")
        .join(quality, "doc_id")
        .join(clusters, "doc_id")
        .select(
            "doc_id",
            "lang",
            "cluster_id",
            rep.cast("int").alias("is_representative"),
            "quality_score",
            (rep & (F.col("quality_score") >= QUALITY_THRESHOLD))
            .cast("int")
            .alias("keep"),
        )
    )


def run_curation_job(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict[str, int]:
    """The full curation JOB, sink included: write the kept documents
    (with their curation metadata) as language-partitioned parquet plus
    the per-language summary — the publish step of a training-data run.
    Language partitioning matches how corpora are consumed downstream
    (per-language sampling/mixing) and gives partition pruning on the
    standard access pattern. Returns row counts for the caller's
    bookkeeping/audit log."""
    docs = table(spark, sf_dir, "documents")
    curated = curated_corpus(spark, sf_dir)
    kept = (
        curated.filter(F.col("keep") == 1)
        .join(docs.select("doc_id", "text", "source", "n_chars"), "doc_id")
        .select(
            "doc_id", "lang", "source", "n_chars", "quality_score", "text"
        )
    )
    kept.write.mode("overwrite").partitionBy("lang").parquet(
        f"{out_dir}/corpus"
    )
    summary = curation_summary(spark, sf_dir)
    summary.write.mode("overwrite").json(f"{out_dir}/summary")
    n_kept = spark.read.parquet(f"{out_dir}/corpus").count()
    n_langs = spark.read.json(f"{out_dir}/summary").count()
    return {"n_kept": n_kept, "n_langs": n_langs}


def curation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics after curation — the report a
    pipeline run emits: total/kept docs, dropped-as-duplicate count, and
    mean quality of the kept set."""
    c = curated_corpus(spark, sf_dir)
    kept_quality = F.when(F.col("keep") == 1, F.col("quality_score"))
    return c.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("keep").alias("n_kept"),
        F.sum(1 - F.col("is_representative")).alias("n_dup_dropped"),
        # exact_sum/count, not avg: quality_score is already on the 1e-6
        # grid (round(,6)), so decimal accumulation is exact and the mean
        # is partition-order-independent at the hashed edge.
        grid_round(exact_sum(kept_quality) / F.count(kept_quality), 6).alias(
            "kept_avg_quality"
        ),
    )


def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation FUNNEL: how many documents survive each successive
    filter stage — the one-page report that tells a pipeline owner
    where the corpus is actually going. Stages (cumulative):

        1_total      every document
        2_blocklist  blocklist hit fraction under 5% (C4-style scrub)
        3_quality    + composite quality score >= 0.5
        4_exact      + exact-dedup representative (min doc_id per
                       content fingerprint — reuses
                       :func:`...dedup.exact_dedup`'s keep rule)
        5_neardup    + not flagged as the higher-id member of any
                       MinHash-LSH candidate pair (greedy min-id keep —
                       the candidate-level approximation of the full
                       cluster-representative rule; pairs are already
                       linear via banding). NOTE the drop set is
                       computed against the FULL corpus, not the
                       stage-4 survivors: a doc whose only lower-id
                       partner was itself removed at stage 2-3 still
                       drops here (dedup-against-corpus-then-filter
                       semantics — the order most pipelines run,
                       because the dup graph is built once on raw
                       data; a survivor-scoped dedup would need the
                       greedy chain re-run per filter configuration)

    Scale shape: one pass computes every per-doc flag (the blocklist /
    quality projections are scan-speed; the fingerprint min and the LSH
    drop set are the same shuffles their standalone queries pay), a
    single aggregate folds the conjunctions into 5 integer counts, and
    ``stack`` unpivots the one-row result — no per-stage re-scan of the
    corpus. Counts are integers; the fraction is an integer-ratio
    double on the 1e-6 grid."""
    from geektime_bigdata_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
    )
    from geektime_bigdata_spark.operators.textstats import blocklist_scrub

    docs = table(spark, sf_dir, "documents")
    bl = blocklist_scrub(spark, sf_dir).select("doc_id", "keep_flag")
    quality = doc_quality_scores(spark, sf_dir).select(
        "doc_id", "quality_score"
    )
    # the 4_exact stage IS exact_dedup's keep rule — reuse it so the
    # funnel cannot drift from the standalone operator
    reps = exact_dedup(spark, sf_dir).select(
        F.col("keep_doc_id").alias("doc_id"), F.lit(1).alias("is_rep")
    )
    dropped = (
        minhash_lsh_pairs(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    flags = (
        docs.select("doc_id")
        .join(bl, "doc_id")
        .join(quality, "doc_id")
        .join(reps, "doc_id", "left")
        .join(dropped, "doc_id", "left")
        .select(
            (F.col("keep_flag") == 1).alias("s2"),
            (F.col("quality_score") >= 0.5).alias("q"),
            F.col("is_rep").isNotNull().alias("r"),
            F.col("is_dup").isNull().alias("nd"),
        )
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("n1"),
        F.sum(F.col("s2").cast("long")).alias("n2"),
        F.sum((F.col("s2") & F.col("q")).cast("long")).alias("n3"),
        F.sum((F.col("s2") & F.col("q") & F.col("r")).cast("long")).alias(
            "n4"
        ),
        F.sum(
            (F.col("s2") & F.col("q") & F.col("r") & F.col("nd")).cast(
                "long"
            )
        ).alias("n5"),
    )
    stages = agg.select(
        F.expr(
            "stack(5, '1_total', n1, '2_blocklist', n2, '3_quality', n3, "
            "'4_exact', n4, '5_neardup', n5) AS (stage, n_docs)"
        ),
        F.col("n1").alias("total"),
    )
    return stages.select(
        "stage",
        "n_docs",
        grid_round(F.col("n_docs") / F.col("total"), 6).alias(
            "pct_of_total"
        ),
    )
