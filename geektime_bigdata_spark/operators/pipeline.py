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
