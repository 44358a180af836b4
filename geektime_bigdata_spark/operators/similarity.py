"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

Two paths, mirroring what a 100 TB vector corpus needs:

- ``ann_topk_bruteforce`` — exact cosine top-k for a small query set:
  broadcast the queries, scan the corpus once, per-partition heap via
  window rank. This is the *correctness baseline* and also the right plan
  whenever |queries| is small (queries broadcast; corpus never shuffles —
  the only exchange is the final per-query top-k).
- ``lsh_hyperplane_buckets`` — random-hyperplane LSH: 8 deterministic
  hash-derived hyperplanes -> 8-bit bucket per vector. At scale, ANN
  probes only matching buckets (candidate generation linear, like the
  MinHash band join in :mod:`dedup`); here the bucket assignment itself is
  the oracle-checked artifact.

All arithmetic is cast to double BEFORE multiplication so Spark and the
DuckDB oracle accumulate in the same precision; scores round to 6dp and
ranking uses the ROUNDED score (+ id tiebreak) so rank order is
engine-independent.

No UDFs: dot products are ``aggregate(zip_with(...))`` — whole-stage
codegen over array columns. A pandas_udf variant would only win for much
wider vectors (>1k dims) where per-row expression trees get deep; at 64
dims the native path is faster and shuffles nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geektime_bigdata_spark.registry import table

N_PLANES = 8
N_QUERIES = 5
TOP_K = 5


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, "
        f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate({a}, CAST(0 AS DOUBLE), "
            f"(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        )
    )


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for query vectors (vec_id < 5).

    Queries broadcast against the corpus scan; cosine is a codegen'd
    array fold; ranking partitions by query only (5 partitions of 500
    candidates — at scale, |corpus| rows stream through per-partition
    top-k heaps before the tiny final exchange)."""
    e = table(spark, sf_dir, "embeddings")
    q = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
        )
    )
    cand = e.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb")
    )
    cos = (_dot("q_emb", "c_emb") / (_norm("q_emb") * _norm("c_emb"))).alias(
        "cos_sim"
    )
    scored = (
        F.broadcast(q)
        .crossJoin(cand)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", F.round(cos, 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


def lsh_hyperplane_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random-hyperplane LSH bucket per vector.

    Plane weights are hash-derived (md5 of "plane,dim" -> int in
    [-1000, 1000] / 1000) so both engines compute identical planes with no
    shared RNG. bit_p = (x . w_p) > 0; bucket = sum 2^p * bit_p.

    Implementation is posexplode -> broadcast-joined plane table -> two
    hash aggregates; at 1B vectors this is a narrow map + two partial
    aggregations, no all-pairs anything."""
    e = table(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", F.posexplode("embedding").alias("d", "x")
    )  # d is 0-based; the oracle subtracts 1 from its 1-based positions
    planes = (
        spark.range(N_PLANES)
        .select(F.col("id").cast("int").alias("p"))
        .crossJoin(spark.range(64).select(F.col("id").cast("int").alias("d")))
        .select(
            "p",
            "d",
            (
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws(",", "p", "d")), 1, 8
                        ),
                        16,
                        10,
                    ).cast("long")
                    % 2001
                    - 1000
                )
                / 1000.0
            ).alias("w"),
        )
    )
    proj = (
        dims.join(F.broadcast(planes), "d")
        .select(
            "vec_id",
            "p",
            (F.col("x").cast("double") * F.col("w")).alias("contrib"),
        )
        .groupBy("vec_id", "p")
        .agg(F.sum("contrib").alias("proj"))
    )
    return (
        proj.groupBy("vec_id")
        .agg(
            F.sum(
                F.when(F.col("proj") > 0, F.expr("shiftleft(1L, p)")).otherwise(
                    F.lit(0)
                )
            ).alias("bucket")
        )
    )


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: vectors in the same LSH
    bucket with cosine >= 0.4 (threshold tuned to the synthetic corpus, whose max pairwise cosine is ~0.51; real embedding corpora would use ~0.95). The bucket equi-join bounds the pair space
    (the scale path); cosine verifies exactly."""
    e = table(spark, sf_dir, "embeddings")
    b = lsh_hyperplane_buckets(spark, sf_dir)
    ev = e.join(b, "vec_id")
    a = ev.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("emb_a"),
        "bucket",
    )
    c = ev.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("emb_b"),
        F.col("bucket").alias("bucket_b"),
    )
    cos = (_dot("emb_a", "emb_b") / (_norm("emb_a") * _norm("emb_b")))
    return (
        a.join(
            c,
            (F.col("bucket") == F.col("bucket_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b", F.round(cos, 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.4)
    )
