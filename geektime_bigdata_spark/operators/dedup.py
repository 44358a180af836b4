"""Deduplication suite for large-scale training-data pipelines.

Four dedup families over the ``documents`` table, all expressed with
native Spark expressions (zero Python in the hot path) and all fully
deterministic so a DuckDB oracle can verify them bit-for-bit:

- exact:       content fingerprint (md5) -> keep lowest doc_id per group.
- MinHash+LSH: shingle -> 12 md5-minhashes -> 4 bands x 3 rows ->
               band-bucket self-join for candidate pairs. The scale path:
               candidate generation is linear in corpus size + band
               collisions, never all-pairs.
- SimHash:     16-bit token-weighted fingerprint per doc (banding for the
               pair search at scale would mirror the MinHash pattern).
- n-gram Jaccard: exact shingle-set similarity via inverted-index
               self-join — quadratic only within shared-shingle groups.

Determinism notes: every hash is md5 (identical across engines); minhash
uses the *string* md5 hex (lexicographic min is engine-independent);
SimHash bit weights come from the first 4 md5 hex chars.

Scale notes (100 TB): the shingle explode multiplies rows ~n_tokens x
but each stage is a hash aggregation on (doc, shingle)-like keys — no
all-pairs stage anywhere except *within* an LSH bucket / shared shingle,
which is the standard trade. For skewed shingles (stopword trigrams) the
inverted-index join would salt or drop top-frequency shingles; here the
31-word vocabulary keeps collision groups small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from geektime_bigdata_spark.registry import table

N_HASHES = 12
BAND_ROWS = 3  # 4 bands x 3 rows


def _shingles_expr(toks: str = "toks", n: int = 3) -> Column:
    """Distinct word-``n``-gram shingles from a token-array column.

    1-based ``element_at`` so doc positions match the DuckDB oracle's
    1-based list indexing exactly.
    """
    idx = ", ".join(f"element_at({toks}, i + {k})" for k in range(n))
    return F.expr(
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> concat_ws(' ', {idx}))) "
        f"ELSE array() END"
    )


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) — one row per distinct 3-gram per document."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
        .select("doc_id", F.explode(_shingles_expr()).alias("shingle"))
    )


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: one row per distinct text with the
    representative (lowest) doc_id and the duplicate count. At scale this
    is one hash-shuffle on a 32-byte key — the cheapest dedup there is."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.col("text")).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc, seed) MinHash values: min md5 over the doc's shingles,
    seeded by prefixing the seed index. Returns N_HASHES rows per doc."""
    sh = _doc_shingles(spark, sf_dir)
    seeds = spark.range(N_HASHES).select(F.col("id").cast("int").alias("seed"))
    return (
        sh.crossJoin(F.broadcast(seeds))
        .select(
            "doc_id",
            "seed",
            F.md5(F.concat_ws(":", F.col("seed"), F.col("shingle"))).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("mh"))
    )


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding: docs agreeing on all
    BAND_ROWS minhashes of any band become a candidate pair.

    The self-join is on (band, band_signature) — collision buckets only,
    never the full cross product. Output is the deduplicated (doc_a, doc_b)
    pair list, doc_a < doc_b."""
    mh = minhash_signatures(spark, sf_dir)
    bands = (
        mh.groupBy("doc_id", F.expr(f"seed div {BAND_ROWS}").alias("band"))
        .agg(
            F.md5(
                F.concat_ws(
                    "",
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("seed", "mh"))),
                        lambda s: s["mh"],
                    ),
                )
            ).alias("sig")
        )
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document: token hash = first 4 md5 hex chars;
    bit j of the fingerprint is 1 iff the tf-weighted sum of (+-1) votes
    from token-hash bit j is positive.

    Pure expression pipeline: tf aggregate -> broadcast 16 bit-positions ->
    two more hash aggregates. No UDFs, no driver loops."""
    docs = table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn(
            "h", F.conv(F.substring(F.md5("word"), 1, 4), 16, 10).cast("long")
        )
    )
    bits = spark.range(16).select(F.col("id").cast("int").alias("j"))
    votes = (
        tf.crossJoin(F.broadcast(bits))
        .select(
            "doc_id",
            "j",
            (
                F.col("tf")
                * (2 * F.expr("shiftright(h, j) & 1") - 1)
            ).alias("vote"),
        )
        .groupBy("doc_id", "j")
        .agg(F.sum("vote").alias("s"))
    )
    return (
        votes.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("shiftleft(1L, j)")).otherwise(
                    F.lit(0)
                )
            ).alias("simhash")
        )
    )


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard similarity for doc pairs sharing >= 1 shingle,
    thresholded at 0.1 — the verification stage a MinHash candidate pass
    would feed at scale (here run directly; the inverted-index join keeps
    the pair space to docs that actually co-occur in a posting list)."""
    sh = _doc_shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")
    )
    jaccard = F.col("c") / (F.col("n_a") + F.col("n_b") - F.col("c"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(jaccard, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.1)
    )
