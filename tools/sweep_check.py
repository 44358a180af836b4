"""Vanilla-session mirror of the driver's per-round correctness sweep.

Runs the first N ``queries()`` entries (the driver checks a 50-slot
prefix) — or ``--all`` of them — in a plain ``local[$SPARK_GRAFT_CPUS]``
SparkSession against their DuckDB oracles via the same comparison the
pytest harness uses (tests/oracle.py, Arrow-strict fetch).  Prior
rounds ran this ad hoc before shipping a prefix rotation; this makes
the pre-ship check a one-liner:

    python tools/sweep_check.py                 # 50-slot prefix, sf0.01
    python tools/sweep_check.py --all --sf /root/testdata/sf0.1
    python tools/sweep_check.py --names png_roundtrip_features,cdc_apply
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--all", action="store_true")
    ap.add_argument(
        "--names",
        help="comma-separated registry names to check (a changed-surface "
        "spot check); overrides --n/--all; unknown names fail fast",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from oracle import assert_matches_oracle, duckdb_connection

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
        .appName("gbs-sweep-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = list(queries)
    if args.names:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
        unknown = [n for n in names if n not in queries]
        if unknown:
            raise SystemExit(f"unknown registry names: {unknown}")
    elif not args.all:
        names = names[: args.n]
    con = duckdb_connection(args.sf)

    t_all = time.monotonic()
    failures: dict[str, str] = {}
    for i, name in enumerate(names, 1):
        t0 = time.monotonic()
        try:
            df = queries[name](spark, args.sf)
            if name in oracles:
                assert_matches_oracle(df, con, oracles[name], name)
                status = "PASS"
            else:
                n = df.count()
                status = f"ROWS-ONLY({n})"
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            status = "FAIL"
            failures[name] = f"{type(exc).__name__}: {exc}"
        print(
            f"[{i:3d}/{len(names)}] {name:45s} {status:14s}"
            f" {time.monotonic() - t0:6.2f}s",
            flush=True,
        )

    print(
        json.dumps(
            {
                "sf": args.sf,
                "swept": len(names),
                "failed": len(failures),
                "total_sec": round(time.monotonic() - t_all, 1),
                "failures": failures,
            }
        )
    )
    spark.stop()
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
