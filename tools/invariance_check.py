"""Distribution-invariance differential: every registered query must
produce VALUE-identical output under toggled execution configs.

This is the cluster-portability claim in executable form (first run
r13, promoted to a tool r14): if no op's values depend on runtime
re-planning (AQE), parallelism (shuffle partitions), or the ANSI
evaluation mode, then the same values come back on local[8]/4
partitions and on a 1000-executor layout. The ANSI axis is new in r14
— the r13 ORC overflow catch (ANSI threw ARITHMETIC_OVERFLOW at sf0.1
where non-ANSI would have silently wrapped) showed mode toggling has
real correctness visibility: a silent-wrap divergence shows up here as
a value mismatch, an ANSI-only error as a one-sided ERR.

Usage:
    python tools/invariance_check.py --axis aqe   --sf /root/testdata/sf0.1
    python tools/invariance_check.py --axis ansi  --sf /root/testdata/sf0.001
    python tools/invariance_check.py --axis shuffle --sf /root/testdata/sf0.001

Operator session memos are cleared between passes (release_caches):
a relation checkpointed under config A must not satisfy config B's
run, or the differential tests nothing.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

AXES = {
    "aqe": ("spark.sql.adaptive.enabled", ["true", "false"]),
    "ansi": ("spark.sql.ansi.enabled", ["true", "false"]),
    "shuffle": ("spark.sql.shuffle.partitions", ["4", "64"]),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--axis", choices=sorted(AXES), required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--names", help="comma-separated subset")
    args = ap.parse_args()
    key, values = AXES[args.axis]

    from pyspark.sql import SparkSession

    from geektime_bigdata_spark.session import release_caches

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(HERE, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName(f"gbs-invariance-{args.axis}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry.queries()
    names = (
        [n.strip() for n in args.names.split(",")]
        if args.names
        else list(queries)
    )
    unknown = [n for n in names if n not in queries]
    if unknown:
        sys.exit(f"unknown names: {unknown}")

    t0 = time.time()
    results: dict[str, dict[str, object]] = {n: {} for n in names}
    for val in values:
        spark.conf.set(key, val)
        release_caches(spark)  # no cross-config memo reuse
        for i, n in enumerate(names, 1):
            try:
                rows = sorted(
                    tuple(map(str, r))
                    for r in queries[n](spark, args.sf).collect()
                )
                results[n][val] = rows
            except Exception as ex:  # one-sided error IS a finding
                results[n][val] = f"ERR {type(ex).__name__}: {ex}"[:300]
            print(
                f"\r[{key}={val}] {i}/{len(names)}",
                end="",
                file=sys.stderr,
                flush=True,
            )
        print(file=sys.stderr)
    spark.conf.set(key, values[0])
    release_caches(spark)

    bad = []
    for n in names:
        a, b = results[n][values[0]], results[n][values[1]]
        if a != b:
            bad.append(n)
            print(f"MISMATCH {n}:")
            for val in values:
                r = results[n][val]
                desc = r if isinstance(r, str) else f"{len(r)} rows"
                print(f"  {key}={val}: {desc}")
    verdict = "IDENTICAL" if not bad else f"{len(bad)} MISMATCHED: {bad}"
    print(
        f"invariance[{args.axis}] sf={args.sf}: {len(names)} queries, "
        f"{verdict} ({time.time() - t0:.1f}s)"
    )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
