"""Dump the executed (AQE-final) SQL plan node metrics for one query.

    python tools/sql_profile.py --name ngram_jaccard_pairs_dfcapped
"""
import argparse
import json
import os
import sys
import urllib.request

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from geektime_bigdata_spark import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="gbs-sql-profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4091"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    run(queries[args.name](spark, args.sf))  # warm
    run(queries[args.name](spark, args.sf))  # measured

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4091/api/v1/applications/{app_id}"
    with urllib.request.urlopen(f"{base}/sql?length=200") as r:
        sqls = json.load(r)
    last = max(sqls, key=lambda s: s["id"])
    with urllib.request.urlopen(
        f"{base}/sql/{last['id']}?details=true&planDescription=true"
    ) as r:
        detail = json.load(r)
    print("duration_ms", detail.get("duration"))
    for node in detail.get("nodes", []):
        mets = {
            m["name"]: m["value"]
            for m in node.get("metrics", [])
            if any(k in m["name"] for k in (
                "time", "rows", "size", "spill", "build"))
        }
        interesting = {k: v for k, v in mets.items() if v and v not in ("0", "0 ms", "0.0 B")}
        if interesting:
            print(f"[{node['nodeId']:3d}] {node['nodeName']}")
            for k, v in interesting.items():
                print(f"       {k}: {v}")


if __name__ == "__main__":
    main()
