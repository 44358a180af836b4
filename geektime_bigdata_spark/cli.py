"""Command-line entry point — the engine's analogue of the reference's
per-homework ``main()`` classes (Main.java:19, InvertedMain.scala:10,
DistCopyMain.scala:16): every registered query is runnable, explainable,
and timeable from a shell.

    python -m geektime_bigdata_spark list
    python -m geektime_bigdata_spark run q1_pricing_summary --sf-dir /root/testdata/sf0.01
    python -m geektime_bigdata_spark explain q5_local_supplier_volume
    python -m geektime_bigdata_spark bench
    python -m geektime_bigdata_spark publish --out /tmp/corpus_out

``publish`` is the end-to-end curation JOB (quality -> near-dup
clusters -> representative selection -> language-partitioned parquet
corpus + per-language JSON summary) — the write path a training-data
run actually executes, not just a query returning rows. Deterministic:
re-running over the same input produces the same partition layout and
summary, and the final line is one JSON object for machine consumption.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _queries():
    import __spark_entry__ as entrymod

    return entrymod.queries()


def _default_sf_dir() -> str:
    # same env var the bench surface honors (SPARK_GRAFT_SF_DIR), so a
    # shell exporting it once drives every CLI subcommand and bench at
    # the same scale; --sf-dir still overrides per invocation
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="geektime_bigdata_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    p_run = sub.add_parser("run", help="run a query and show rows")
    p_run.add_argument("name")
    p_run.add_argument(
        "--sf-dir",
        default=_default_sf_dir(),
        help="data dir (default: $SPARK_GRAFT_SF_DIR if set, else /root/testdata/sf0.01)",
    )
    p_run.add_argument("--limit", type=int, default=20)

    p_exp = sub.add_parser("explain", help="print the formatted physical plan")
    p_exp.add_argument("name")
    p_exp.add_argument(
        "--sf-dir",
        default=_default_sf_dir(),
        help="data dir (default: $SPARK_GRAFT_SF_DIR if set, else /root/testdata/sf0.01)",
    )

    sub.add_parser("bench", help="run the headline bench (one JSON line)")

    p_pub = sub.add_parser(
        "publish",
        help="run the curation job: partitioned corpus + summary sink",
    )
    p_pub.add_argument(
        "--sf-dir",
        default=_default_sf_dir(),
        help="data dir (default: $SPARK_GRAFT_SF_DIR if set, else /root/testdata/sf0.01)",
    )
    p_pub.add_argument("--out", required=True)

    args = ap.parse_args(argv)

    if args.cmd == "publish":
        import json

        from geektime_bigdata_spark import get_spark
        from geektime_bigdata_spark.operators.pipeline import run_curation_job

        spark = get_spark(app_name="gbs-cli-publish")
        spark.sparkContext.setLogLevel("ERROR")
        t0 = time.perf_counter()
        stats = run_curation_job(spark, args.sf_dir, args.out)
        print(
            json.dumps(
                {
                    "job": "publish",
                    "sf_dir": args.sf_dir,
                    "out": args.out,
                    **stats,
                    "sec": round(time.perf_counter() - t0, 2),
                }
            )
        )
        return 0

    if args.cmd == "bench":
        import bench

        bench.main()
        return 0

    queries = _queries()
    if args.cmd == "list":
        for name in sorted(queries):
            print(name)
        return 0

    if args.name not in queries:
        print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2

    from geektime_bigdata_spark import get_spark
    from geektime_bigdata_spark.plans import explain_str

    spark = get_spark(app_name=f"gbs-cli-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    df = queries[args.name](spark, args.sf_dir)
    if args.cmd == "explain":
        print(explain_str(df, "formatted"))
    else:
        t0 = time.perf_counter()
        df.show(args.limit, truncate=False)
        print(
            f"[{args.name}] {df.count()} rows,"
            f" {time.perf_counter() - t0:.2f}s at {args.sf_dir}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
