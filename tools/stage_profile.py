"""Per-stage executor CPU/runtime attribution for one registry query.

Runs the named query warm with the UI REST API enabled, then prints each
stage's name, task count, executorRunTime and executorCpuTime — the
empirical loop of guide §1.1/§7.1 without a browser.

    python tools/stage_profile.py --name ngram_jaccard_pairs_dfcapped
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
        app_name="gbs-stage-profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4090"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    run(queries[args.name](spark, args.sf))  # warm (fills caches, codegen)
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    spark.sparkContext.setJobGroup("prof", "prof")
    run(queries[args.name](spark, args.sf))
    spark.sparkContext.setJobGroup(None, None)

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4090/api/v1/applications/{app_id}"
    with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
        stages = json.load(r)
    jobs_url = f"{base}/jobs"
    with urllib.request.urlopen(jobs_url) as r:
        jobs = json.load(r)
    warm_stage_ids = set()
    for j in jobs:
        if j.get("jobGroup") == "prof":
            warm_stage_ids.update(j.get("stageIds", []))
    rows = []
    for s in stages:
        if s["stageId"] not in warm_stage_ids:
            continue
        rows.append((
            s["executorCpuTime"] / 1e9,
            s["executorRunTime"] / 1e3,
            s["numCompleteTasks"],
            s.get("shuffleWriteBytes", 0),
            s.get("shuffleReadBytes", 0),
            s["stageId"],
            (s.get("description") or s["name"])[:110],
        ))
    rows.sort(reverse=True)
    total_cpu = sum(r[0] for r in rows)
    total_run = sum(r[1] for r in rows)
    print(f"warm stages={len(rows)} total executorCpu={total_cpu:.2f}s "
          f"executorRun={total_run:.2f}s")
    for cpu, runt, nt, sw, sr, sid, nm in rows:
        print(f"  cpu {cpu:6.2f}s run {runt:6.2f}s tasks {nt:4d} "
              f"shW {sw/1e6:7.1f}MB shR {sr/1e6:7.1f}MB  s{sid} {nm}")


if __name__ == "__main__":
    main()
