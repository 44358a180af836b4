"""Job-count regression guard (VERDICT r13 item 6).

The r12/r13 per-query job censuses were the forensics that localized
the two structural outliers this engine has had (embedding_pca_top2's
sequential loop, 104 -> 79 -> 39 jobs across two adjudicated rewrites;
neardup_reach_rcte's recursive CTE) — warm Spark JOB counts are
structural facts of a plan (actions, materializations, checkpoint
cadence), far more stable on this noisy VM than wall time. This test
pins the census top-5 so a plan regression (a lost broadcast forcing a
materialization, an un-checkpointed iterate re-executing 2^k subplans,
an extra pass) surfaces as a test failure instead of a bench surprise.

Ceilings are the r14 warm measurements + 3 slack (session-config
jitter such as an AQE re-plan can move a count by one or two; the
regression classes this guard exists for jump by tens — the r12
checkpoint trap measured 139 vs 104 jobs on the same op).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

# (query, measured warm jobs r14 @ sf0.001, ceiling = measured + 3)
CEILINGS = [
    # r18: driver-side DP gate on the size-gated branch + step-by-2
    # recursion (seeded depths 1+2, distinct 2-hop extension) —
    # 45 -> 24 warm jobs
    ("neardup_reach_rcte", 24, 27),
    ("neardup_random_walks", 43, 46),
    # r16: driver-side eigen-solve over the 4096-row Gram (bit-equal
    # to the distributed twin) — 39 -> 2 warm jobs
    ("embedding_pca_top2", 2, 5),
    # r18: collected top-k windows + literal replace chains — 20 -> 12
    ("bpe_train_merges_batched", 12, 15),
    ("bpe_train_merges", 12, 15),
]


def _warm_job_count(spark, name, sf_dir):
    q = entry.queries()[name]
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    tracker = spark.sparkContext.statusTracker()
    group = f"jobguard-{name}"
    spark.sparkContext.setJobGroup(group, group)
    try:
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    finally:
        spark.sparkContext.setJobGroup(None, None)
    return len(tracker.getJobIdsForGroup(group))


@pytest.mark.parametrize("name,measured,ceiling", CEILINGS)
def test_job_count_stays_under_ceiling(spark, sf_dir, name, measured, ceiling):
    jobs = _warm_job_count(spark, name, sf_dir)
    assert jobs <= ceiling, (
        f"{name} ran {jobs} warm jobs (measured {measured}, ceiling "
        f"{ceiling}) — a structural plan regression (lost checkpoint, "
        "extra materialization, lost broadcast); see the census notes "
        "in SURVEY §7.15-§7.17 before raising the ceiling"
    )
