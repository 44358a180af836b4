"""Distributed file utility — homework-4's DistCopy (S8/U1).

The reference parallelizes a recursive directory copy over an RDD of
(src, dst) pairs (DistCopyMain.scala:46-70). Same shape here:
driver-side tree walk -> ``parallelize(pairs, n)`` -> ``mapPartitions``
doing the per-partition I/O, statuses collected back.

Reference bugs deliberately fixed (SURVEY.md §2.8):
- DistCopyMain.scala:68 closes the FileSystem before the lazy iterator
  runs — here each partition's copies complete before the function
  returns (results are materialized in a list, not a lazy map).
- ``ignoreFailures`` is parsed but never read (DistCopyMain.scala:23,28)
  — here it actually gates whether a failed copy raises or is reported.
- invalid-arg paths print-but-continue (DistCopyMain.scala:18-20,47-49)
  — here they raise.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def list_tree(root: str) -> list[str]:
    """Recursive relative-path listing of all files under ``root``."""
    out: list[str] = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            out.append(
                os.path.relpath(os.path.join(dirpath, fn), root)
            )
    return sorted(out)


def dist_copy(
    spark: SparkSession,
    src: str,
    dst: str,
    parallelism: int = 3,
    ignore_failures: bool = False,
) -> list[str]:
    """Copy the ``src`` tree to ``dst`` with ``parallelism`` concurrent
    partitions (reference default maxConcurrence=3, DistCopyMain.scala:24).

    Returns one status string per file ("OK <rel>" / "FAIL <rel>: <err>").
    Local-FS implementation (the test environment has no HDFS); on a real
    cluster the per-partition copy body would use the Hadoop FileSystem
    API identically — the distribution pattern is the point.
    """
    if not os.path.isdir(src):
        raise ValueError(f"source is not a directory: {src}")
    # mirror directory skeleton up-front (DistCopyMain.scala:74-80 walks
    # dirs on the driver too) so partitions never race on mkdir
    rels = []
    for dirpath, dirnames, filenames in os.walk(src):
        rel_dir = os.path.relpath(dirpath, src)
        os.makedirs(os.path.join(dst, rel_dir), exist_ok=True)
        for fn in filenames:
            rels.append(os.path.normpath(os.path.join(rel_dir, fn)))
    if not rels:
        return []

    def copy_partition(it):
        results = []
        for rel in it:  # fully consumed before returning — no lazy-close bug
            try:
                shutil.copyfile(os.path.join(src, rel), os.path.join(dst, rel))
                results.append(f"OK {rel}")
            except Exception as ex:  # noqa: BLE001 - status-reporting path
                if not ignore_failures:
                    raise
                results.append(f"FAIL {rel}: {ex}")
        return results

    n = max(1, min(parallelism, len(rels)))
    return (
        spark.sparkContext.parallelize(sorted(rels), n)
        .mapPartitions(copy_partition)
        .collect()
    )


def compact_parquet(
    spark, path: str, target_files: int = 1
) -> int:
    """Small-file compaction — the maintenance job every streaming/
    micro-batch sink eventually needs (thousands of tiny files destroy
    scan throughput: per-file open cost + tiny row groups defeat the
    columnar reader). Rewrites the dataset into ``target_files`` files
    per partition via coalesce (no shuffle — coalesce only merges
    existing partitions) through a temp dir, then swaps. Returns the
    resulting file count. At scale this runs per table partition with
    target sized to ~1 GB files."""
    import os
    import shutil

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".compacting"
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    # re-read from tmp before dropping the source (lazy plans must not
    # reference the dir being replaced)
    n = spark.read.parquet(tmp).count()
    orig = spark.read.parquet(path).count()
    if n != orig:  # paranoia gate before destructive swap
        raise RuntimeError(f"compaction row mismatch: {n} != {orig}")
    shutil.rmtree(path)
    os.rename(tmp, path)
    return len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )
