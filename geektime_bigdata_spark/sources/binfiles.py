"""Binary-file export/ingest — the path media corpora actually take.

The multimodal family (operators/multimodal.py) synthesizes and
decodes container blobs INSIDE the engine; what it never exercised is
the filesystem boundary: exporting one blob per record (how image/
audio shards are laid out for labeling tools and dataloaders) and
re-ingesting a directory of opaque files through Spark's built-in
``binaryFile`` source (path, modificationTime, length, content —
reference-stack parity: the closest HDFS analogue is a
SequenceFile/dir-of-blobs layout, DistCopyMain.scala's subject
matter). At 100 TB both directions scale with partition count: the
export writes from executors via mapInPandas (no driver funnel; on a
real cluster the destination must be a shared filesystem or an
object-store mount — the same requirement every Spark sink has), and
the ingest lists + reads files in parallel with ``pathGlobFilter``
pruning non-matching names at the listing, before any bytes are read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geektime_bigdata_spark.functions import lift_collected


def export_blobs(
    df: DataFrame, path: str, name_col: str = "name", payload_col: str = "payload"
) -> int:
    """Write one binary file per row (``<name>.bin`` under ``path``),
    from the executors. Returns the number of files written (summed
    from per-batch counts, so the action that runs the export also
    verifies it). Payload column may be string (utf-8 encoded) or
    binary; a ``None`` payload or name is rejected with a ValueError
    naming the row rather than silently serialized. Names containing a
    path separator, or equal to the bare ``..`` segment, are rejected —
    a name is a leaf filename, never a path — so a hostile/dirty name
    column cannot escape the export directory (with separators banned,
    an EMBEDDED ``..`` like ``v1..v2`` cannot traverse and stays
    legal). Duplicate names overwrite each other
    last-writer-wins (filesystem semantics); the returned count counts
    ROWS WRITTEN, not distinct files — callers needing the file-set
    invariant should reconcile against a distinct-name count, as the
    registered surface's n_files aggregate does implicitly."""
    import pandas as pd

    os.makedirs(path, exist_ok=True)

    def write_batches(it):
        for pdf in it:
            n = 0
            for name, payload in zip(pdf[name_col], pdf[payload_col]):
                if name is None or payload is None:
                    raise ValueError(
                        f"export_blobs: NULL {'name' if name is None else 'payload'}"
                        f" for row name={name!r}"
                    )
                name = str(name)
                if (
                    os.sep in name
                    or (os.altsep and os.altsep in name)
                    or name in ("", ".", "..")
                ):
                    # '' and '.' don't traverse, but they produce the
                    # hidden artifacts '.bin' / '..bin' — dirty data,
                    # not legitimate leaf names (ADVICE r15)
                    raise ValueError(
                        f"export_blobs: name {name!r} contains a path"
                        " separator or is empty/'.'/'..' — names must"
                        " be leaf filenames"
                    )
                data = payload if isinstance(payload, bytes) else str(payload).encode("utf-8")
                with open(os.path.join(path, f"{name}.bin"), "wb") as fh:
                    fh.write(data)
                n += 1
            yield pd.DataFrame({"n": [n]})

    counts = df.select(name_col, payload_col).mapInPandas(
        write_batches, "n long"
    )
    return counts.agg(F.sum("n")).collect()[0][0] or 0


def read_binary_files(
    spark: SparkSession, path: str, glob: str = "*.bin"
) -> DataFrame:
    """Ingest a directory of opaque files via the built-in
    ``binaryFile`` source. ``pathGlobFilter`` prunes at the LISTING —
    non-matching files cost a directory entry, never a read — which at
    100 TB is the difference between scanning the shard and scanning
    the datacenter. Known boundary (measured r14, pinned by
    test_binary_export_ingest_roundtrip): the source silently DROPS
    zero-byte files — Spark's file-partition planner never schedules
    an empty split — so a pipeline where an empty blob is meaningful
    must either sentinel it (1-byte marker) or reconcile counts
    against the listing."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def binary_ingest_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver surface proving the export -> binaryFile ingest loop
    end-to-end: build a deterministic ASCII payload per selected
    document (``repeat(md5(doc_id), 4)`` — 128 bytes; ASCII so the
    content checksum is engine-identical: DuckDB 1.0's md5 only takes
    VARCHAR), export one file per doc from the executors, re-ingest
    the directory through ``binaryFile`` with a glob (a planted decoy
    file proves the listing-level prune), recover each doc_id FROM THE
    FILENAME, join language back from the documents table, and emit
    per-lang integrity aggregates: file count, byte mass, an
    order-independent md5 checksum over the CONTENT bytes (flips if
    any file's bytes are mangled), and a name<->content binding
    checksum over ``doc_id || ':' || md5(content)`` (flips if payloads
    land under the wrong filename — a plain content sum cannot see a
    swap). The DuckDB oracle rebuilds the identical payloads straight
    off the documents table and computes the same aggregates — the
    filesystem trip is exactly what the differential isolates.
    Scratch lifecycle mirrors the other roundtrip surfaces."""
    import shutil
    import tempfile

    from geektime_bigdata_spark.registry import table

    scratch = tempfile.mkdtemp(prefix="gbs_blobs_")
    try:
        docs = (
            table(spark, sf_dir, "documents")
            .filter(F.expr("doc_id % 10 = 0"))
            .select(
                F.concat(F.lit("doc_"), F.col("doc_id")).alias("name"),
                F.expr(
                    "repeat(md5(CAST(doc_id AS STRING)), 4)"
                ).alias("payload"),
            )
        )
        export_blobs(docs, scratch)
        # decoy: same directory, wrong extension — the glob must prune
        # it at listing time, or n_files flips
        with open(os.path.join(scratch, "decoy.tmp"), "wb") as fh:
            fh.write(b"not a shard member")
        back = read_binary_files(spark, scratch).select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
            .cast("long")
            .alias("doc_id"),
            F.length("content").cast("long").alias("n_bytes"),
            F.md5("content").alias("content_md5"),
        )
        langs = table(spark, sf_dir, "documents").select("doc_id", "lang")
        out = (
            back.join(langs, "doc_id")  # per-doc relation: unhinted (r15)
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_files"),
                F.sum("n_bytes").cast("long").alias("sum_bytes"),
                F.sum(
                    F.expr(
                        "CAST(conv(substr(content_md5, 1, 8), 16, 10)"
                        " AS BIGINT)"
                    )
                )
                .cast("long")
                .alias("content_checksum"),
                F.sum(
                    F.expr(
                        "CAST(conv(substr(md5(concat(CAST(doc_id AS"
                        " STRING), ':', content_md5)), 1, 8), 16, 10)"
                        " AS BIGINT)"
                    )
                )
                .cast("long")
                .alias("binding_checksum"),
            )
        )
        return lift_collected(spark, out)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
