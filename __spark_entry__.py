"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps each
implemented operator (SURVEY.md §2 + extensions) to a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` gives the DuckDB
twin for the driver's differential correctness check.
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from geektime_bigdata_spark import streaming
from geektime_bigdata_spark.sources import pyds
from geektime_bigdata_spark.operators import (
    dedup,
    etl,
    joins,
    multimodal,
    pipeline,
    relational,
    scale,
    similarity,
    text,
    textstats,
    tpch,
    windows,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.flow_stats(spark, SF0001)


def _streaming_upsert_with_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the foreachBatch upsert sink in a scratch dir and REMOVE it
    after materializing the final state (ADVICE r2: the old per-call
    ``mkdtemp`` leaked parquet state + checkpoints across driver runs).
    The state is collected and re-created as a local DataFrame so the
    returned plan has no dangling reference to the deleted path."""
    out_dir = tempfile.mkdtemp(prefix="gbs_upsert_")
    try:
        df = streaming.run_streaming_upsert_sink(spark, sf_dir, out_dir)
        return spark.createDataFrame(df.collect(), df.schema)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def _streaming_attr_full_outer_surface(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic surface for the FULL OUTER stream-stream join: all
    matched rows, plus null-padded rows of EITHER side only when safely
    inside that side's state-eviction bound. With the engine watermark
    wm = least(max p_ts, max c_ts) - 2h: an unmatched purchase is
    evicted once wm >= p_ts (keep p_ts <= wm - 1h margin), an unmatched
    click once wm >= c_ts + 1h — its joinable purchases extend 1h past
    it — (keep c_ts <= wm - 2h margin). The oracle mirrors both cutoffs."""
    from pyspark.sql import functions as F

    from geektime_bigdata_spark.registry import table

    out = streaming.run_streaming_attribution_full_outer(spark, sf_dir)
    e = table(spark, sf_dir, "events")
    row = e.agg(
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p"),
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).alias("c"),
    ).collect()[0]
    wm_min = min(row["p"], row["c"])
    return out.filter(
        (F.col("c_ts").isNotNull() & F.col("p_ts").isNotNull())
        | (
            F.col("c_ts").isNull()
            & (F.col("p_ts") <= F.lit(wm_min) - F.expr("INTERVAL 3 HOURS"))
        )
        | (
            F.col("p_ts").isNull()
            & (F.col("c_ts") <= F.lit(wm_min) - F.expr("INTERVAL 4 HOURS"))
        )
    )


def _streaming_attr_outer_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic driver surface for the watermarked LEFT OUTER
    stream-stream join: all matched rows, plus null-padded rows only for
    purchases safely inside the state-eviction bound.

    The engine's final watermark is the MIN across both watermark
    operators, each computed on its own FILTERED stream — i.e.
    ``least(max(p_ts), max(c_ts)) - 2h`` (measured empirically: null
    rows stop exactly at that value, NOT at max(ts) - 2h). Null rows are
    kept only for ``p_ts <= least(maxP, maxC) - 2h - 1h``: one full hour
    inside whichever boundary strictness Spark applies, so the emitted
    set cannot depend on a boundary tie. The oracle mirrors: inner pairs
    UNION unmatched purchases under the same cutoff."""
    from pyspark.sql import functions as F

    from geektime_bigdata_spark.registry import table

    out = streaming.run_streaming_attribution_outer(spark, sf_dir)
    e = table(spark, sf_dir, "events")
    row = e.agg(
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p"),
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).alias("c"),
    ).collect()[0]
    wm_min = min(row["p"], row["c"])
    return out.filter(
        F.col("c_ts").isNotNull()
        | (F.col("p_ts") <= F.lit(wm_min) - F.expr("INTERVAL 3 HOURS"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    ORDERING CONTRACT: the driver sweeps a 50-slot prefix, so entries
    are ordered by verification debt (round 3 re-sort, third session):
    (1) the two rounds-1/2 hash-fails, now re-surfaced as all-integer
    outputs; (2) queries new or contract-changed this round (incl. the
    six third-session additions); (3) the queries that have never
    received a driver row (streaming x8, multimodal x3, pipeline x2,
    windows/time-series x6); (4) past-prefix: six displaced twins whose
    oracles are shared with an in-prefix or already-green sibling, the
    later third-session additions (pair features, mix weights, entropy,
    k-core, VARIANT, arrow-UDF, recursive closure, SQL UDF, LISTAGG,
    recency decay, pipe syntax, BPE trainer, column profiler — all
    pytest-parity-green at 3 scales, queued for the round-4 sweep),
    then everything already green in CORRECTNESS_r01/r02. A prefix of
    any length always maximizes newly-verified coverage."""
    return {
        # --- (1) rounds-1/2 hash-fails: the integer-surface fix to prove ---
        "sessionize": windows.sessionize,
        "streaming_sessionization": (
            lambda spark, sf_dir: streaming.run_streaming_sessionization(
                spark, sf_dir
            )
        ),
        # --- (2) contract surface changed / new this round ---
        # third-session additions: Python DataSource V2 end-to-end,
        # CDC MERGE application, snapshot diff, per-source caps,
        # quality x dup calibration, cross-source contamination matrix
        "pyds_tsv_roundtrip": pyds.tsv_roundtrip_stats,
        "cdc_apply": etl.cdc_apply,
        "corpus_snapshot_diff": etl.corpus_snapshot_diff,
        "per_source_caps": textstats.per_source_caps,
        "quality_dup_calibration": textstats.quality_dup_calibration,
        "source_overlap_matrix": dedup.source_overlap_matrix,
        "running_user_totals": windows.running_user_totals,
        "ann_topk_ivf_multiprobe": similarity.ann_topk_ivf_multiprobe,
        "cluster_balanced_sample": similarity.cluster_balanced_sample,
        "semantic_dedup_multiprobe": similarity.semantic_dedup_multiprobe,
        "contrastive_negatives": textstats.contrastive_negatives,
        "ngram_containment_pairs": dedup.ngram_containment_pairs,
        "dedup_cluster_representatives": dedup.dedup_cluster_representatives,
        "unigram_logprob_scores": textstats.unigram_logprob_scores,
        "hourly_anomaly_scores": windows.hourly_anomaly_scores,
        # round-3 continuation: corpus-boilerplate detection, C4-style
        # blocklist scrubbing, source-mix diagnostics, sequence mining
        "boilerplate_ngrams": dedup.boilerplate_ngrams,
        "boilerplate_coverage": dedup.boilerplate_coverage,
        "blocklist_scrub": textstats.blocklist_scrub,
        "source_vocab_overlap": textstats.source_vocab_overlap,
        "user_path_trigrams": windows.user_path_trigrams,
        "quality_weighted_sample": textstats.quality_weighted_sample,
        "bpe_pair_counts": textstats.bpe_pair_counts,
        # time-series densification + growth analytics
        "gap_filled_hourly": etl.gap_filled_hourly,
        "cohort_retention": windows.cohort_retention,
        # capstone: stage-by-stage curation funnel over the filter chain
        "curation_funnel": pipeline.curation_funnel,
        # sliding distinct + graph-density diagnostics
        "sliding_wau": windows.sliding_wau,
        "neardup_triangles": dedup.neardup_triangles,
        # distributed X^T X via numpy partial Grams + integer merge
        "embedding_gram_matrix": similarity.embedding_gram_matrix,
        # --- (3) never driver-checked: streaming suite ---
        "streaming_attribution_outer": _streaming_attr_outer_surface,
        "streaming_attribution_full_outer": _streaming_attr_full_outer_surface,
        "streaming_hourly_rollup": (
            lambda spark, sf_dir: streaming.run_streaming_hourly_rollup(
                spark, sf_dir
            )
        ),
        "streaming_sliding_counts": (
            lambda spark, sf_dir: streaming.run_streaming_sliding_counts(
                spark, sf_dir
            )
        ),
        "streaming_enriched_rollup": (
            lambda spark, sf_dir: streaming.run_streaming_enriched_rollup(
                spark, sf_dir
            )
        ),
        "streaming_attribution": (
            lambda spark, sf_dir: streaming.run_streaming_attribution(
                spark, sf_dir
            )
        ),
        # dropDuplicatesWithinWatermark emits whole first-arrival rows
        # (arrival order is partition-nondeterministic), so the driver
        # surface is the DETERMINISTIC part: the key set that passed.
        # Single-batch assumption guarded in the runner.
        "streaming_dedup": (
            lambda spark, sf_dir: streaming.run_streaming_dedup(
                spark, sf_dir
            )
            .select("user_id", "event_type")
            .distinct()
        ),
        # foreachBatch upsert state: latest row per key with a total
        # (ts, event_id) tiebreak — deterministic however the stream is
        # micro-batched. Scratch dir removed after materialization.
        "streaming_upsert_sink": _streaming_upsert_with_cleanup,
        # --- (3) never driver-checked: multimodal plumbing (stub decoder
        #     is deterministic, so even the Python decode path is fully
        #     oracle-checked; features canonicalize to micro-unit strings)
        "media_type_stats": multimodal.media_type_stats,
        "media_features": multimodal.media_features_str,
        "media_features_wide": multimodal.media_features_wide,
        # --- (3) never driver-checked: curation pipeline ---
        "curated_corpus": pipeline.curated_corpus,
        "curation_summary": pipeline.curation_summary,
        # --- (3) never driver-checked: windows / time-series ---
        "customer_balance_quartiles": windows.customer_balance_quartiles,
        "user_value_trend": windows.user_value_trend,
        "asof_last_click": windows.asof_last_click,
        "hourly_event_rollup": windows.hourly_event_rollup,
        "json_props_extract": windows.json_props_extract,
        "sliding_window_counts": windows.sliding_window_counts,
        # production-shape continuous-ingest dedup (registered past the
        # 50-slot sweep prefix — pytest-verified now, driver row next
        # round; bumping a changed-surface re-check would cost more)
        "incoming_batch_dedup": dedup.incoming_batch_dedup,
        # twins displaced from the sweep prefix to admit the six new
        # third-session queries: each shares an oracle (or its core
        # logic) with an in-prefix or already-green sibling, so its
        # correctness surface is partially covered until its own row
        # lands — these head the round-4 queue
        "asof_last_click_cogroup": windows.asof_last_click_cogroup,
        "media_resize_digest": multimodal.media_resize_digest,
        "frame_sample_digest": multimodal.frame_sample_digest,
        "event_type_melt": windows.event_type_melt,
        "embedding_norms_arrow": similarity.embedding_norms_arrow,
        "streaming_session_windows": (
            lambda spark, sf_dir: streaming.run_streaming_session_windows(
                spark, sf_dir
            )
        ),
        # streaming quadrants of the Python datasource (readStream ->
        # availableNow -> per-batch-committed stream sink); pytest-green,
        # queued behind the batch roundtrip's driver row
        "pyds_stream_roundtrip": pyds.stream_roundtrip_stats,
        # third-session batch 2 (past-prefix, pytest-parity-covered,
        # r4 queue): candidate-pair feature join, temperature mixing,
        # lexical entropy
        "neardup_pair_features": dedup.neardup_pair_features,
        "source_mix_weights": textstats.source_mix_weights,
        "token_entropy_scores": textstats.token_entropy_scores,
        "neardup_kcore": dedup.neardup_kcore,
        # Spark-4 VARIANT twin of json_props_extract + the
        # arrow-optimized scalar UDF tier (4th twin of the norm oracle)
        "json_props_variant": windows.json_props_variant,
        "embedding_norms_arrow_udf": similarity.embedding_norms_arrow_udf,
        # Spark-4.1 WITH RECURSIVE over the oriented candidate DAG
        "neardup_reach_rcte": dedup.neardup_reach_rcte,
        # Spark-4.1 catalog SQL UDF (declarative body, Catalyst-inlined)
        "sql_udf_lang_stats": relational.sql_udf_lang_stats,
        # ANSI LISTAGG ... WITHIN GROUP (Spark 4.1)
        "lang_source_listagg": textstats.lang_source_listagg,
        # exponentially time-decayed per-user activity (recency weight)
        "user_recency_scores": windows.user_recency_scores,
        # SQL pipe syntax |> with typed named-parameter binding
        "event_type_stats_pipe": relational.event_type_stats_pipe,
        # iterative BPE merge training (2 greedy steps, corpus-wide)
        "bpe_train_merges": textstats.bpe_train_merges,
        # one-scan multi-column catalog profiler (stack unpivot)
        "orders_column_profile": etl.orders_column_profile,
        # exact-recall prefix-filtering similarity join (AllPairs)
        "prefix_filter_jaccard_pairs": dedup.prefix_filter_jaccard_pairs,
        # winsorized stats + drift histogram (feature-prep profiling)
        "clipped_value_stats": etl.clipped_value_stats,
        "value_histogram": etl.value_histogram,
        # mixture planning: budget allocation + truncation audit
        "mixture_allocation": textstats.mixture_allocation,
        "truncation_report": textstats.truncation_report,
        # reproducible DeepWalk-style sampler over the dup graph
        "neardup_random_walks": dedup.neardup_random_walks,
        # skip-gram (center, context) pairs from the walks
        "walk_skipgram_pairs": dedup.walk_skipgram_pairs,
        # ---- (4a) driver-green but CONTRACT SURFACE CHANGED in round 3
        #      (the grid-round sweep replaced every scale-2/4 round() —
        #      the empirically knife-edged class — so these earn fresh
        #      rows inside the 50-slot sweep ahead of unchanged greens)
        "q1_pricing_summary": joins.q1_pricing_summary,
        "q3_shipping_priority": joins.q3_shipping_priority,
        "q5_local_supplier_volume": joins.q5_local_supplier_volume,
        "q6_forecast_revenue": joins.q6_forecast_revenue,
        "q10_returned_items": joins.q10_returned_items,
        "q7_volume_shipping": tpch.q7_volume_shipping,
        "q9_product_profit": tpch.q9_product_profit,
        "q11_important_stock": tpch.q11_important_stock,
        "q15_top_supplier": tpch.q15_top_supplier,
        "q18_large_volume_customers": tpch.q18_large_volume_customers,
        "q19_discounted_revenue": tpch.q19_discounted_revenue,
        "q22_global_sales_opportunity": tpch.q22_global_sales_opportunity,
        "student_q2": relational.student_q2,
        "flow_stats": relational.flow_stats,
        "sales_rollup": relational.sales_rollup,
        "order_status_cube": relational.order_status_cube,
        "orders_by_month": windows.orders_by_month,
        "event_type_pivot": windows.event_type_pivot,
        "session_window_rollup": windows.session_window_rollup,
        "order_price_quantiles": windows.order_price_quantiles,
        "continuous_hourly_rollup": etl.continuous_hourly_rollup,
        "tfidf_top_terms": text.tfidf_top_terms,
        "bm25_top_terms": text.bm25_top_terms,
        "broadcast_dim_join": joins.broadcast_dim_join,
        # ---- (4b) driver-green in rounds 1-2, surface unchanged ----
        "doc_repetition_scores": textstats.doc_repetition_scores,
        "length_bucket_stats": textstats.length_bucket_stats,
        "semantic_dedup": similarity.semantic_dedup,
        "kmeans_step": similarity.kmeans_step,
        "bow_dedup": dedup.bow_dedup,
        "order_grouping_sets": relational.order_grouping_sets,
        "corpus_report": textstats.corpus_report,
        "key_skew_report": scale.key_skew_report,
        "event_funnel": windows.event_funnel,
        # --- dedup suite (training-data pipeline) ---
        "exact_dedup": dedup.exact_dedup,
        "minhash_signatures": dedup.minhash_signatures,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "simhash_fingerprints": dedup.simhash_fingerprints,
        "simhash_neardup_pairs": dedup.simhash_neardup_pairs,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "minhash_jaccard_estimate": dedup.minhash_jaccard_estimate,
        "neardup_pagerank": dedup.neardup_pagerank,
        "dedup_clusters": dedup.dedup_clusters,
        "benchmark_contamination": dedup.benchmark_contamination,
        # --- similarity search ---
        "ann_topk_bruteforce": similarity.ann_topk_bruteforce,
        "label_centroids": similarity.label_centroids,
        "ann_topk_ivf": similarity.ann_topk_ivf,
        "lsh_hyperplane_buckets": similarity.lsh_hyperplane_buckets,
        "embedding_neardup_pairs": similarity.embedding_neardup_pairs,
        "embedding_quantize_int8": similarity.embedding_quantize_int8,
        # --- text / inverted index (homework-4 parity) ---
        "term_freq": text.term_freq,
        "inverted_index_str": text.inverted_index_str,
        "posting_list_tf_str": text.posting_list_tf_str,
        "positional_postings": text.positional_postings,
        "phrase_search": text.phrase_search,
        "word_counts": text.word_counts,
        "chunk_documents": text.chunk_documents,
        "salted_top_words": scale.salted_top_words,
        # --- text analysis ---
        "token_counts": textstats.token_counts,
        "lang_id_heuristic": textstats.lang_id_heuristic,
        "doc_quality_scores": textstats.doc_quality_scores,
        "doc_fingerprints": textstats.doc_fingerprints,
        "rolling_fingerprints": textstats.rolling_fingerprints,
        "stratified_sample": textstats.stratified_sample,
        "vocab_coverage": textstats.vocab_coverage,
        "dataset_splits": textstats.dataset_splits,
        "packed_sequences": textstats.packed_sequences,
        # --- ETL / pipeline ---
        "scd2_intervals": etl.scd2_intervals,
        "orders_audit": etl.orders_audit,
        "incremental_ingest_dedup": etl.incremental_ingest_dedup,
        # --- relational core (homework-1/-2/-3/-5 parity) ---
        "null_filter_empty": relational.null_filter_empty,
        "cast_filter": relational.cast_filter,
        "const_score_order": relational.const_score_order,
        "distinct_pairs": relational.distinct_pairs,
        "except_anti": relational.except_anti,
        "prefix_scan_desc": relational.prefix_scan_desc,
        "point_lookup": relational.point_lookup,
        "upsert_latest": relational.upsert_latest,
        "versioned_cells": relational.versioned_cells,
        "sql_catalog_query": relational.sql_catalog_query,
        "nation_full_outer": joins.nation_full_outer,
        "intersect_segments": joins.intersect_segments,
        "embedding_norms_pandas": similarity.embedding_norms_pandas,
        # --- joins / flagship analytics (J1-J3 + TPC-H-style) ---
        "q14_promo_effect": joins.q14_promo_effect,
        "q2_min_cost_supplier": tpch.q2_min_cost_supplier,
        "q4_order_priority": tpch.q4_order_priority,
        "q8_market_share": tpch.q8_market_share,
        "q12_late_priority": tpch.q12_late_priority,
        "q13_customer_distribution": tpch.q13_customer_distribution,
        "q16_part_supplier_counts": tpch.q16_part_supplier_counts,
        "q17_small_quantity_revenue": tpch.q17_small_quantity_revenue,
        "q20_heavy_shippers": tpch.q20_heavy_shippers,
        "q21_suppliers_waiting": tpch.q21_suppliers_waiting,
        "semi_anti_join": joins.semi_anti_join,
        "top_k_orders": joins.top_k_orders,
        "attribution_range_join": joins.attribution_range_join,
        # --- windows / time-series (driver-green) ---
        "window_topn_orders": windows.window_topn_orders,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins; column names/aliases match queries().

    Float contract rule: every hashed column derived from a
    nondeterministically-ordered double sum accumulates through LONG
    micro-units on BOTH engines (``CAST(sum(CAST(floor(x * 1000000.0 +
    0.5) AS BIGINT)) AS DOUBLE) / 1000000.0`` here,
    :func:`geektime_bigdata_spark.functions.exact_sum` in the Spark
    plan) — the quantization is identical IEEE double arithmetic in
    every engine and integer addition is associative, so partitioning
    can never flip a round(,N) boundary (round 1's only driver FAIL)."""
    micro_cols = " || ',' || ".join(
        f"CAST(floor(f{i} * 1000000.0 + 0.5) AS BIGINT)" for i in range(8)
    )
    centroid_cols = ", ".join(
        f"floor((CAST(sum(CAST(floor((CAST(embedding[{i + 1}] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS c{i}"
        for i in range(64)
    )
    media_f_cols = ", ".join(
        f"floor((coalesce(max(CASE WHEN k = {i} THEN s END), 0) * 1.0"
        f" / greatest(n, 1)) * 1000000.0 + 0.5) / 1000000.0 AS f{i}"
        for i in range(8)
    )
    media_norm = " + ".join(f"f{i} * f{i}" for i in range(8))
    # unrolled PageRank iterations (SQL has no loops): r1..r5, each the
    # exact scalar-op mirror of the Spark recurrence in
    # dedup.neardup_pagerank (1e-9-unit quantized contributions)
    pagerank_iters = "".join(
        f""", r{k} AS (
                SELECT d0.doc_id,
                       floor(((0.15 / n.n_docs)
                              + (0.85 * (coalesce(s.m, 0) / 1000000000.0)))
                             * 1000000000.0 + 0.5) / 1000000000.0 AS pr
                FROM documents d0 CROSS JOIN n
                LEFT JOIN (
                    SELECT b.d AS dst,
                           sum(CAST(floor((r.pr / g.deg)
                                          * 1000000000.0 + 0.5) AS BIGINT))
                               AS m
                    FROM bidir b
                    JOIN r{k - 1} r ON r.doc_id = b.s
                    JOIN deg g ON g.src = b.s
                    GROUP BY 1) s ON s.dst = d0.doc_id
            )"""
        for k in range(1, 6)
    )
    # unrolled k-core peels (dedup.neardup_kcore, k=2, max_rounds=8):
    # each round drops edges touching a node of degree < 2; idempotent
    # once converged, and the Spark side RAISES if 8 rounds don't
    # converge, so a fixed unrolling is exact. MATERIALIZED is load-
    # bearing: each round references the previous one 3x, and DuckDB
    # inlines plain CTEs per reference — an un-materialized chain
    # plans 3^8 copies of the base scan (observed as an fd-exhaustion
    # "Too many open files", not just slowness)
    kcore_rounds = "".join(
        f""", deg{i} AS MATERIALIZED (
                SELECT doc_a, count(*) AS d FROM und{i - 1} GROUP BY doc_a
            ), alive{i} AS MATERIALIZED (
                SELECT doc_a FROM deg{i} WHERE d >= 2
            ), und{i} AS MATERIALIZED (
                SELECT u.doc_a, u.doc_b FROM und{i - 1} u
                JOIN alive{i} x ON u.doc_a = x.doc_a
                JOIN alive{i} y ON u.doc_b = y.doc_a
            )"""
        for i in range(1, 9)
    )
    # unrolled BPE training steps (textstats.bpe_train_merges): learn
    # top adjacent pair, merge non-overlapping occurrences (parity
    # within consecutive-match runs = greedy left-to-right), renumber.
    # MATERIALIZED per the k-core lesson: each step reads its
    # predecessor several times.
    bpe_steps = "".join(
        f""", pr{k} AS MATERIALIZED (
                SELECT doc_id, pos, tok,
                       lead(tok) OVER (PARTITION BY doc_id ORDER BY pos)
                           AS nxt
                FROM s{k - 1}
            ), cnt{k} AS (
                SELECT tok || ' ' || nxt AS pair, count(*) AS pair_count
                FROM pr{k} WHERE nxt IS NOT NULL GROUP BY 1
            ), top{k} AS MATERIALIZED (
                SELECT pair, pair_count FROM cnt{k}
                ORDER BY pair_count DESC, pair LIMIT 1
            ), mt{k} AS MATERIALIZED (
                SELECT p.doc_id, p.pos FROM pr{k} p, top{k} t
                WHERE p.tok || ' ' || p.nxt = t.pair
            ), run{k} AS (
                SELECT doc_id, pos,
                       sum(CASE WHEN prev = pos - 1 THEN 0 ELSE 1 END)
                           OVER (PARTITION BY doc_id ORDER BY pos)
                           AS run_id
                FROM (SELECT doc_id, pos,
                             lag(pos) OVER (PARTITION BY doc_id
                                            ORDER BY pos) AS prev
                      FROM mt{k})
            ), st{k} AS MATERIALIZED (
                SELECT doc_id, pos FROM (
                    SELECT doc_id, pos,
                           min(pos) OVER (PARTITION BY doc_id, run_id)
                               AS rs
                    FROM run{k})
                WHERE (pos - rs) % 2 = 0
            ), s{k} AS MATERIALIZED (
                SELECT p.doc_id,
                       row_number() OVER (PARTITION BY p.doc_id
                                          ORDER BY p.pos) AS pos,
                       CASE WHEN st.pos IS NOT NULL
                            THEN p.tok || '_' || p.nxt
                            ELSE p.tok END AS tok
                FROM pr{k} p
                LEFT JOIN st{k} st
                  ON st.doc_id = p.doc_id AND st.pos = p.pos
                WHERE NOT EXISTS (
                    SELECT 1 FROM st{k} c
                    WHERE c.doc_id = p.doc_id AND c.pos = p.pos - 1)
            )"""
        for k in (1, 2)
    )
    # unrolled deterministic random-walk steps (dedup.neardup_random_walks):
    # successor = sorted-neighbors[md5(walk:step:cur) mod degree];
    # DuckDB lists are 1-based where Spark SQL arrays are 0-based,
    # hence the 1 + idx. MATERIALIZED per the k-core lesson.
    walk_steps = "".join(
        f""", w{k} AS MATERIALIZED (
                SELECT w.node, w.walk,
                       a.nbrs[1 + CAST(
                           ('0x' || substr(md5(w.walk || ':' || {k}
                                               || ':' || w.cur), 1, 8)
                           )::BIGINT % len(a.nbrs) AS INT)] AS cur,
                       list_append(w.path,
                           a.nbrs[1 + CAST(
                               ('0x' || substr(md5(w.walk || ':' || {k}
                                                   || ':' || w.cur), 1, 8)
                               )::BIGINT % len(a.nbrs) AS INT)]) AS path
                FROM w{k - 1} w JOIN adj a ON a.node = w.cur
            )"""
        for k in (1, 2, 3)
    )
    oracles = {
        "media_type_stats": f"""
            WITH bytes AS (
                SELECT doc_id, length(text) AS n,
                       ascii(substring(text, pos, 1)) AS byte,
                       (pos - 1) % 8 AS k
                FROM (SELECT doc_id, text,
                             unnest(generate_series(1, length(text))) AS pos
                      FROM documents)
            ), acc AS (
                SELECT doc_id, n, k, sum(byte) AS s FROM bytes GROUP BY 1, 2, 3
            ), wide AS (
                SELECT doc_id, CAST(n AS BIGINT) AS n_bytes, {media_f_cols}
                FROM acc GROUP BY doc_id, n
            ), feat AS (
                SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                            WHEN doc_id % 3 = 1 THEN 'audio'
                            ELSE 'video' END AS media_type,
                       n_bytes,
                       floor(sqrt({media_norm}) * 1000000.0 + 0.5) / 1000000.0 AS feature_norm
                FROM wide
            )
            SELECT media_type, count(*) AS n_docs,
                   CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
                   floor((CAST(sum(CAST(floor((feature_norm) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_feature_norm
            FROM feat GROUP BY media_type
        """,
        "media_features_wide": f"""
            WITH bytes AS (
                SELECT doc_id, length(text) AS n,
                       ascii(substring(text, pos, 1)) AS byte,
                       (pos - 1) % 8 AS k
                FROM (SELECT doc_id, text,
                             unnest(generate_series(1, length(text))) AS pos
                      FROM documents)
            ), acc AS (
                SELECT doc_id, n, k, sum(byte) AS s FROM bytes GROUP BY 1, 2, 3
            ), wide AS (
                SELECT doc_id, CAST(n AS BIGINT) AS n_bytes, {media_f_cols}
                FROM acc GROUP BY doc_id, n
            )
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS media_type,
                   n_bytes, f0, f1, f2, f3, f4, f5, f6, f7,
                   floor(sqrt({media_norm}) * 1000000.0 + 0.5) / 1000000.0 AS feature_norm
            FROM wide
        """,
        "media_features": f"""
            WITH bytes AS (
                SELECT doc_id, length(text) AS n,
                       ascii(substring(text, pos, 1)) AS byte,
                       (pos - 1) % 8 AS k
                FROM (SELECT doc_id, text,
                             unnest(generate_series(1, length(text))) AS pos
                      FROM documents)
            ), acc AS (
                SELECT doc_id, n, k, sum(byte) AS s FROM bytes GROUP BY 1, 2, 3
            ), wide AS (
                SELECT doc_id, CAST(n AS BIGINT) AS n_bytes, {media_f_cols}
                FROM acc GROUP BY doc_id, n
            )
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS media_type,
                   n_bytes,
                   {micro_cols} AS feature_str,
                   floor(sqrt({media_norm}) * 1000000.0 + 0.5) / 1000000.0 AS feature_norm
            FROM wide
        """,
        "label_centroids": f"""
            SELECT label, {centroid_cols}
            FROM embeddings GROUP BY label
        """,
        "flow_stats": """
            SELECT user_id,
                   floor((CAST(sum(CAST(floor((CASE WHEN event_type = 'click' THEN value ELSE 0 END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS sum_up,
                   floor((CAST(sum(CAST(floor((CASE WHEN event_type = 'view' THEN value ELSE 0 END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS sum_down,
                   floor((CAST(sum(CAST(floor((CASE WHEN event_type IN ('click','view') THEN value ELSE 0 END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS sum_total
            FROM events GROUP BY user_id
        """,
        "null_filter_empty": """
            SELECT c_name FROM (
                SELECT c_custkey, c_name, c_acctbal FROM customer
                WHERE c_acctbal > 18 AND c_custkey <> NULL
            ) WHERE c_acctbal < 35
        """,
        "cast_filter": """
            SELECT CAST(c_custkey AS VARCHAR) AS id, c_name FROM customer
            WHERE CAST(CAST(c_custkey AS VARCHAR) AS INTEGER) > 100
        """,
        "const_score_order": """
            SELECT c_custkey, c_name, CAST(100 - 10 AS INTEGER) AS score
            FROM customer ORDER BY score, c_custkey
        """,
        "distinct_pairs": """
            SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
        """,
        "except_anti": """
            SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 0
            EXCEPT
            SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
        """,
        "student_q2": """
            SELECT id, name, CAST(100 - 10 AS INTEGER) AS score FROM (
                SELECT c_custkey AS id, c_name AS name FROM customer WHERE c_acctbal > 18
                EXCEPT
                SELECT DISTINCT c_custkey AS id, c_name AS name FROM customer
                WHERE c_mktsegment = 'BUILDING'
            ) WHERE CAST(id AS INTEGER) > 100 ORDER BY score, id
        """,
        "prefix_scan_desc": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE c_name LIKE 'Customer#00000001%'
            ORDER BY c_name DESC
        """,
        "point_lookup": """
            SELECT c_custkey, c_name FROM customer WHERE c_custkey = 42
        """,
        "upsert_latest": """
            SELECT user_id, event_type, ts, value, event_id FROM (
                SELECT user_id, event_type, ts, value, event_id,
                       row_number() OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC
                       ) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "versioned_cells": """
            SELECT user_id, event_type, version, ts, value, event_id FROM (
                SELECT user_id, event_type, ts, value, event_id,
                       row_number() OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) AS version
                FROM events)
            WHERE version <= 3
        """,
        "sql_catalog_query": """
            SELECT n.n_name, count(*) AS n_orders,
                   floor((CAST(sum(CAST(floor((o.o_totalprice) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 10000.0 + 0.5) / 10000.0 AS total_price
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE o.o_orderstatus = 'F'
            GROUP BY n.n_name
        """,
        "sales_rollup": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS n,
                   floor((CAST(sum(CAST(floor((l_quantity) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 100.0 + 0.5) / 100.0 AS sum_qty,
                   CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS lvl
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "order_status_cube": """
            SELECT o_orderstatus, o_orderpriority,
                   count(*) AS n,
                   floor((CAST(sum(CAST(floor((o_totalprice) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 10000.0 + 0.5) / 10000.0 AS total,
                   CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS lvl
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "user_value_trend": """
            -- exact-integer OLS mirror of the applyInPandas slope:
            -- x = µs offsets (BIGINT), y = value cents (BIGINT), HUGEINT
            -- sums, one final double division — order-independent, unlike
            -- regr_slope's float accumulation
            WITH c AS (
                SELECT user_id,
                       CAST(floor(value * 100 + 0.5) AS BIGINT) AS yc,
                       epoch_us(ts)
                           - min(epoch_us(ts)) OVER (PARTITION BY user_id)
                           AS xu
                FROM events
            ), s AS (
                SELECT user_id, count(*) AS n,
                       sum(CAST(xu AS HUGEINT)) AS sx,
                       sum(CAST(yc AS HUGEINT)) AS sy,
                       sum(CAST(xu AS HUGEINT) * yc) AS sxy,
                       sum(CAST(xu AS HUGEINT) * xu) AS sxx
                FROM c GROUP BY user_id
            )
            SELECT user_id,
                   CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                        ELSE floor(((CAST(n * sxy - sx * sy AS DOUBLE)
                                    / CAST(n * sxx - sx * sx AS DOUBLE))
                                   * 36000000.0) * 1000000.0 + 0.5) / 1000000.0
                   END AS slope,
                   n AS n_events
            FROM s
        """,
        "customer_balance_quartiles": """
            SELECT c_custkey, c_mktsegment, c_acctbal,
                   CAST(ntile(4) OVER w AS BIGINT) AS quartile,
                   floor((percent_rank() OVER w) * 1000000.0 + 0.5) / 1000000.0 AS pct_rank
            FROM customer
            WINDOW w AS (PARTITION BY c_mktsegment
                         ORDER BY c_acctbal DESC, c_custkey)
        """,
        "nation_full_outer": """
            SELECT coalesce(nk_c, nk_s) AS nationkey, n_customers, n_suppliers
            FROM (SELECT c_nationkey AS nk_c, count(*) AS n_customers
                  FROM customer GROUP BY c_nationkey) c
            FULL OUTER JOIN
                 (SELECT s_nationkey AS nk_s, count(*) AS n_suppliers
                  FROM supplier GROUP BY s_nationkey) s
              ON nk_c = nk_s
        """,
        "intersect_segments": """
            SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 1000
            INTERSECT
            SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
        """,
        "orders_by_month": """
            SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
                   CAST(month(o_orderdate) AS BIGINT) AS mo,
                   count(*) AS n_orders,
                   floor((CAST(sum(CAST(floor((o_totalprice) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 10000.0 + 0.5) / 10000.0 AS revenue
            FROM orders GROUP BY 1, 2
        """,
        "event_type_pivot": """
            SELECT user_id,
                   floor((CAST(sum(CAST(floor((CASE WHEN event_type = 'click' THEN value END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS click,
                   floor((CAST(sum(CAST(floor((CASE WHEN event_type = 'view' THEN value END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS view,
                   floor((CAST(sum(CAST(floor((CASE WHEN event_type = 'purchase' THEN value END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS purchase,
                   floor((CAST(sum(CAST(floor((CASE WHEN event_type = 'signup' THEN value END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS signup,
                   floor((CAST(sum(CAST(floor((CASE WHEN event_type = 'error' THEN value END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS error
            FROM events GROUP BY user_id
        """,
        "embedding_norms_pandas": """
            SELECT vec_id,
                   floor((sqrt(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0)) * 1000000.0 + 0.5) / 1000000.0 AS l2_norm
            FROM (SELECT vec_id, embedding,
                         unnest(generate_series(1, len(embedding))) AS i
                  FROM embeddings)
            GROUP BY vec_id
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   floor((CAST(sum(CAST(floor((l_quantity) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 100.0 + 0.5) / 100.0 AS sum_qty,
                   floor((CAST(sum(CAST(floor((l_extendedprice) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 100.0 + 0.5) / 100.0 AS sum_base_price,
                   floor((CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
                   floor((CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 100.0 + 0.5) / 100.0 AS sum_charge,
                   floor((CAST(sum(CAST(floor((l_quantity) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_qty,
                   floor((CAST(sum(CAST(floor((l_extendedprice) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_price,
                   floor((CAST(sum(CAST(floor((l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey, o_orderdate, o_orderpriority,
                   floor((CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 10000.0 + 0.5) / 10000.0 AS revenue
            FROM customer
            JOIN orders ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
              AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
        "q5_local_supplier_volume": """
            SELECT n_name,
                   floor((CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 10000.0 + 0.5) / 10000.0 AS revenue
            FROM region
            JOIN nation ON n_regionkey = r_regionkey
            JOIN customer ON c_nationkey = n_nationkey
            JOIN orders ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
            WHERE r_name IN ('AMERICA', 'ASIA')
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name
        """,
        "q6_forecast_revenue": """
            SELECT floor((CAST(sum(CAST(floor((l_extendedprice * l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 10000.0 + 0.5) / 10000.0 AS revenue,
                   count(*) AS n_lines
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              AND l_discount >= 0.03 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "q10_returned_items": """
            SELECT c_custkey, c_name, c_acctbal, n_name,
                   floor((CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 10000.0 + 0.5) / 10000.0 AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey
            LIMIT 20
        """,
        "q14_promo_effect": """
            SELECT floor((100.0 * CAST(sum(CAST(floor((CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0
                / (CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0)) * 1000000.0 + 0.5) / 1000000.0 AS promo_revenue_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
        """,
        "q2_min_cost_supplier": """
            WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
            cand AS (
                SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
                       min(s_acctbal) OVER (PARTITION BY p_partkey) AS min_bal
                FROM ps
                JOIN part ON l_partkey = p_partkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                WHERE p_size <= 5 AND p_type = 'LARGE'
            )
            SELECT s_acctbal, s_name, n_name, p_partkey, p_name
            FROM cand WHERE s_acctbal = min_bal
            ORDER BY s_acctbal DESC, p_partkey, s_name
            LIMIT 100
        """,
        "q4_order_priority": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
              AND EXISTS (
                  SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL '30 days')
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "q7_volume_shipping": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   floor((CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 10000.0 + 0.5) / 10000.0 AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE n1.n_name IN ('NATION_1', 'NATION_2')
              AND n2.n_name IN ('NATION_1', 'NATION_2')
              AND n1.n_name <> n2.n_name
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "q8_market_share": """
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   floor((CAST(sum(CAST(floor((CASE WHEN n1.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0
                         / (CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0)) * 1000000.0 + 0.5) / 1000000.0
                       AS mkt_share
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region ON n2.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY o_year ORDER BY o_year
        """,
        "q9_product_profit": """
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   floor((CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 10000.0 + 0.5) / 10000.0
                       AS sum_profit
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%red%'
            GROUP BY 1, 2 ORDER BY 1, 2 DESC
        """,
        "q11_important_stock": """
            WITH v AS (
                SELECT l_partkey, CAST(sum(CAST(floor((l_extendedprice) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS value
                FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                WHERE n_name = 'NATION_4'
                GROUP BY l_partkey
            )
            SELECT l_partkey, floor((value) * 10000.0 + 0.5) / 10000.0 AS value
            FROM v WHERE value > 0.002 * (SELECT CAST(sum(CAST(floor((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 FROM v)
            ORDER BY value DESC, l_partkey
        """,
        "q12_late_priority": """
            SELECT l_linestatus,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT)
                       AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
              AND l_shipdate > o_orderdate + INTERVAL '60 days'
            GROUP BY l_linestatus ORDER BY l_linestatus
        """,
        "q13_customer_distribution": """
            SELECT c_count, count(*) AS custdist
            FROM (
                SELECT c_custkey, count(o_orderkey) AS c_count
                FROM customer
                LEFT OUTER JOIN orders
                  ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
                GROUP BY c_custkey
            )
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "q15_top_supplier": """
            WITH revenue AS (
                SELECT l_suppkey,
                       floor((CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 10000.0 + 0.5) / 10000.0
                           AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
                GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, total_revenue
            FROM revenue JOIN supplier ON l_suppkey = s_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
            ORDER BY s_suppkey
        """,
        "q16_part_supplier_counts": """
            SELECT p_brand, p_type, p_size,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
            JOIN part ON p_partkey = l_partkey
            WHERE p_size IN (1, 5, 9, 13, 17) AND p_type <> 'PROMO'
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "attribution_range_join": """
            SELECT p.event_id AS purchase_id, p.user_id,
                   count(*) AS n_prior_clicks, max(c.ts) AS last_click_ts
            FROM events p JOIN events c
              ON p.user_id = c.user_id
             AND p.event_type = 'purchase' AND c.event_type = 'click'
             AND c.ts >= p.ts - INTERVAL '1 hour' AND c.ts < p.ts
            GROUP BY 1, 2
        """,
        "q17_small_quantity_revenue": """
            SELECT floor((CAST(sum(CAST(floor((l_extendedprice) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / 7.0) * 10000.0 + 0.5) / 10000.0 AS avg_yearly
            FROM (
                SELECT l_extendedprice, l_quantity,
                       avg(l_quantity) OVER (PARTITION BY p_partkey) AS avg_qty
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE p_brand = 'Brand#12'
            )
            WHERE l_quantity < 0.2 * avg_qty
        """,
        "q18_large_volume_customers": """
            WITH big AS (
                SELECT l_orderkey, floor((CAST(sum(CAST(floor((l_quantity) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 100.0 + 0.5) / 100.0 AS sum_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING floor((CAST(sum(CAST(floor((l_quantity) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 100.0 + 0.5) / 100.0 > 180
            )
            SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
                   sum_qty
            FROM orders
            JOIN big ON o_orderkey = l_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 100
        """,
        "q19_discounted_revenue": """
            SELECT floor((CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 10000.0 + 0.5) / 10000.0 AS revenue,
                   count(*) AS n_lines
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 5 AND 15)
               OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
                   AND l_quantity BETWEEN 15 AND 25)
               OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35
                   AND l_quantity BETWEEN 25 AND 35)
        """,
        "q20_heavy_shippers": """
            SELECT s_suppkey, s_name, s_acctbal
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_2'
              AND s_suppkey IN (
                  SELECT l_suppkey
                  FROM lineitem JOIN part ON l_partkey = p_partkey
                  WHERE p_name LIKE '%red%'
                    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                  GROUP BY l_suppkey, l_partkey
                  HAVING sum(l_quantity) > 25)
            ORDER BY s_suppkey
        """,
        "q21_suppliers_waiting": """
            WITH late AS (
                SELECT l_orderkey, l_suppkey
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderstatus = 'F'
                  AND l_shipdate > o_orderdate + INTERVAL '60 days'
            )
            SELECT s_name, count(*) AS numwait
            FROM late l1
            JOIN supplier ON l1.l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_1'
              AND EXISTS (
                  SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (
                  SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
            GROUP BY s_name
            ORDER BY numwait DESC, s_name
            LIMIT 100
        """,
        "q22_global_sales_opportunity": """
            SELECT c_nationkey, count(*) AS numcust,
                   floor((CAST(sum(CAST(floor((c_acctbal) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 10000.0 + 0.5) / 10000.0 AS totacctbal
            FROM customer
            WHERE c_acctbal > (SELECT CAST(sum(CAST(floor((c_acctbal) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*) FROM customer
                               WHERE c_acctbal > 0)
              AND NOT EXISTS (
                  SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
            GROUP BY c_nationkey ORDER BY c_nationkey
        """,
        "broadcast_dim_join": """
            SELECT n_name, count(*) AS n_customers,
                   floor((CAST(sum(CAST(floor((c_acctbal) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 10000.0 + 0.5) / 10000.0 AS total_acctbal
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "semi_anti_join": """
            SELECT c_custkey, c_name,
                   CASE WHEN c_custkey IN (
                       SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
                   ) THEN 1 ELSE 0 END AS has_urgent
            FROM customer
        """,
        "top_k_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
        """,
        "window_topn_orders": """
            SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey
                       ) AS rn
                FROM orders
            ) WHERE rn <= 3
        """,
        "running_user_totals": """
            SELECT user_id, event_id,
                   sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) OVER w AS running_value_micros,
                   count(*) OVER w AS event_idx
            FROM events
            WINDOW w AS (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            )
        """,
        "sessionize": """
            WITH flagged AS (
                SELECT user_id, ts, event_id, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR ts > lag(ts) OVER w + INTERVAL '30 minutes'
                            THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sessions AS (
                SELECT user_id, ts, event_id, value,
                       sum(is_new) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS session_id
                FROM flagged
            )
            SELECT user_id, session_id,
                   count(*) AS n_events,
                   sum(CAST(floor((value) * 1000000.0 + 0.5) AS BIGINT)) AS session_value_micros,
                   epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
            FROM sessions GROUP BY user_id, session_id
        """,
        "asof_last_click": """
            SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
                   max(c.ts) AS last_click_ts,
                   count(c.ts) AS n_prior_clicks
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND c.ts <= p.ts
            GROUP BY p.event_id, p.user_id, p.ts
        """,
        "hourly_event_rollup": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n, floor((CAST(sum(CAST(floor((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS total_value
            FROM events GROUP BY 1, 2
        """,
        "json_props_extract": """
            SELECT event_type,
                   sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
                   min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
                   max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
                   count(*) AS n
            FROM events GROUP BY event_type
        """,
        "pyds_tsv_roundtrip": """
            SELECT event_type, count(*) AS n,
                   sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
                       AS sum_value_micros,
                   count(DISTINCT user_id) AS n_users
            FROM events
            WHERE event_type IN ('click', 'purchase')
            GROUP BY event_type
        """,
        "pyds_stream_roundtrip": """
            SELECT event_type, count(*) AS n,
                   sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
                       AS sum_value_micros
            FROM events
            GROUP BY event_type
        """,
        "cdc_apply": """
            WITH ranked AS (
                SELECT user_id, event_type,
                       CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)
                           AS value_micros,
                       ts,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC)
                           AS rn,
                       count(*) OVER (PARTITION BY user_id) AS n_ops
                FROM events
            )
            SELECT user_id, event_type AS last_op,
                   value_micros AS last_value_micros,
                   ts AS last_ts, n_ops
            FROM ranked WHERE rn = 1 AND event_type <> 'error'
        """,
        "corpus_snapshot_diff": """
            WITH v1 AS (SELECT doc_id, md5(text) AS fp_old FROM documents),
            v2 AS (
                SELECT doc_id,
                       md5(CASE WHEN doc_id % 23 = 0 THEN text || ' [rev2]'
                                ELSE text END) AS fp_new
                FROM documents WHERE doc_id % 37 <> 0
                UNION ALL
                SELECT doc_id + 1000000000 AS doc_id,
                       md5(text || ' [new]') AS fp_new
                FROM documents WHERE doc_id % 41 = 0
            ), j AS (
                SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
                       CASE WHEN v1.doc_id IS NULL THEN 'added'
                            WHEN v2.doc_id IS NULL THEN 'removed'
                            WHEN fp_old <> fp_new THEN 'changed' END
                           AS status,
                       fp_old, fp_new
                FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
            )
            SELECT * FROM j WHERE status IS NOT NULL
        """,
        "per_source_caps": """
            WITH tok AS (
                SELECT doc_id,
                       count(*) AS n_tokens,
                       floor((CAST(sum(CASE WHEN word IN ('the','a','is','what','it','and','of','to','in')
                                      THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS stopword_ratio,
                       floor((count(DISTINCT word) * 1.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS distinct_ratio
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                      FROM documents)
                GROUP BY doc_id
            ), q AS (
                SELECT doc_id,
                       floor((least(n_tokens / 100.0, 1.0) * 0.4
                             + distinct_ratio * 0.4
                             + (1 - stopword_ratio) * 0.2) * 1000000.0 + 0.5) / 1000000.0 AS quality_score
                FROM tok
            ), r AS (
                SELECT d.doc_id, d.source, q.quality_score,
                       row_number() OVER (PARTITION BY d.source
                                          ORDER BY q.quality_score DESC,
                                                   d.doc_id) AS "rank"
                FROM documents d JOIN q USING (doc_id)
            )
            SELECT doc_id, source, quality_score, "rank"
            FROM r WHERE "rank" <= 10
        """,
        "quality_dup_calibration": """
            WITH tok AS (
                SELECT doc_id,
                       count(*) AS n_tokens,
                       floor((CAST(sum(CASE WHEN word IN ('the','a','is','what','it','and','of','to','in')
                                      THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS stopword_ratio,
                       floor((count(DISTINCT word) * 1.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS distinct_ratio
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                      FROM documents)
                GROUP BY doc_id
            ), q AS (
                SELECT doc_id,
                       floor((least(n_tokens / 100.0, 1.0) * 0.4
                             + distinct_ratio * 0.4
                             + (1 - stopword_ratio) * 0.2) * 1000000.0 + 0.5) / 1000000.0 AS quality_score
                FROM tok
            ), toks AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toks)
            ), seeds AS (SELECT unnest(generate_series(0, 11)) AS seed),
            mh AS (
                SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS mh
                FROM sh CROSS JOIN seeds GROUP BY doc_id, seed
            ), bands AS (
                SELECT doc_id, seed // 3 AS band,
                       md5(string_agg(mh, '' ORDER BY seed)) AS sig
                FROM mh GROUP BY doc_id, seed // 3
            ), pairs AS (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
            ), dup AS (
                SELECT DISTINCT doc_id FROM (
                    SELECT doc_a AS doc_id FROM pairs
                    UNION ALL SELECT doc_b AS doc_id FROM pairs)
            ), b AS (
                SELECT least(CAST(floor(quality_score * 1000000.0 + 0.5)
                                  AS BIGINT) // 100000, 9) AS band,
                       CASE WHEN doc_id IN (SELECT doc_id FROM dup)
                            THEN 1 ELSE 0 END AS is_dup,
                       quality_score
                FROM q
            )
            SELECT band, count(*) AS n_docs,
                   CAST(sum(is_dup) AS BIGINT) AS n_neardup,
                   floor((sum(is_dup) * 1.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS dup_rate,
                   floor(min(quality_score) * 1000000.0 + 0.5) / 1000000.0 AS min_quality,
                   floor(max(quality_score) * 1000000.0 + 0.5) / 1000000.0 AS max_quality
            FROM b GROUP BY band
        """,
        "source_overlap_matrix": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toks)
            ), seeds AS (SELECT unnest(generate_series(0, 11)) AS seed),
            mh AS (
                SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS mh
                FROM sh CROSS JOIN seeds GROUP BY doc_id, seed
            ), bands AS (
                SELECT doc_id, seed // 3 AS band,
                       md5(string_agg(mh, '' ORDER BY seed)) AS sig
                FROM mh GROUP BY doc_id, seed // 3
            ), pairs AS (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
            ), s AS (SELECT doc_id, source FROM documents)
            SELECT least(sa.source, sb.source) AS source_a,
                   greatest(sa.source, sb.source) AS source_b,
                   count(*) AS n_pairs
            FROM pairs p
            JOIN s sa ON sa.doc_id = p.doc_a
            JOIN s sb ON sb.doc_id = p.doc_b
            GROUP BY 1, 2
        """,
        "neardup_pair_features": """
        WITH     toks AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id,
               toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
        FROM (SELECT doc_id, toks,
                     unnest(generate_series(1, len(toks) - 2)) AS pos
              FROM toks)
    ), seeds AS (SELECT unnest(generate_series(0, 11)) AS seed),
    mh AS (
        SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS mh
        FROM sh CROSS JOIN seeds GROUP BY doc_id, seed
    ), bands AS (
        SELECT doc_id, seed // 3 AS band,
               md5(string_agg(mh, '' ORDER BY seed)) AS sig
        FROM mh GROUP BY doc_id, seed // 3
    ), pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (
            SELECT p.doc_a, p.doc_b, count(*) AS c
            FROM pairs p
            JOIN sh s1 ON s1.doc_id = p.doc_a
            JOIN sh s2 ON s2.doc_id = p.doc_b AND s2.shingle = s1.shingle
            GROUP BY 1, 2
        ), stf AS (
            SELECT doc_id, word, count(*) AS tf,
                   ('0x' || substr(md5(word), 1, 4))::BIGINT AS h
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                  FROM documents)
            WHERE word <> '' GROUP BY doc_id, word
        ), votes AS (
            SELECT doc_id, j, sum(tf * (2 * ((h >> j) & 1) - 1)) AS s
            FROM stf CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) bits
            GROUP BY doc_id, j
        ), fps AS (
            SELECT doc_id,
                   CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END)
                        AS BIGINT) AS simhash
            FROM votes GROUP BY doc_id
        )
        SELECT p.doc_a, p.doc_b,
               CAST(coalesce(i.c, 0) AS BIGINT) AS n_common,
               sa.n AS n_a, sb.n AS n_b,
               floor((coalesce(i.c, 0) * 1.0 / (sa.n + sb.n - coalesce(i.c, 0)))
                     * 1000000.0 + 0.5) / 1000000.0 AS jaccard,
               floor((coalesce(i.c, 0) * 1.0 / least(sa.n, sb.n))
                     * 1000000.0 + 0.5) / 1000000.0 AS containment,
               CAST(bit_count(xor(fa.simhash, fb.simhash)) AS BIGINT)
                   AS simhash_hamming,
               floor((least(sa.n, sb.n) * 1.0 / greatest(sa.n, sb.n))
                     * 1000000.0 + 0.5) / 1000000.0 AS len_ratio
        FROM pairs p
        LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
        JOIN sizes sa ON sa.doc_id = p.doc_a
        JOIN sizes sb ON sb.doc_id = p.doc_b
        JOIN fps fa ON fa.doc_id = p.doc_a
        JOIN fps fb ON fb.doc_id = p.doc_b
    """,
        "source_mix_weights": """
        WITH per_src AS (
            SELECT source, count(*) AS n_docs,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens
            FROM documents GROUP BY source
        ), m AS (
            SELECT source, n_docs, n_tokens,
                   CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0
                              + 0.5) AS BIGINT) AS mass
            FROM per_src
        )
        SELECT source, n_docs, n_tokens,
               floor((CAST(mass AS DOUBLE)
                      / CAST((SELECT sum(mass) FROM m) AS DOUBLE))
                     * 1000000.0 + 0.5) / 1000000.0 AS mix_weight
        FROM m
    """,
        "token_entropy_scores": """
        WITH tf AS (
            SELECT doc_id, word, count(*) AS tf
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                  FROM documents)
            WHERE word <> '' GROUP BY 1, 2
        ), n AS (
            SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens
            FROM tf GROUP BY 1
        ), t AS (
            SELECT tf.doc_id, n.n_tokens,
                   CAST(floor((CAST(tf.tf AS DOUBLE) / n.n_tokens)
                              * ln(CAST(tf.tf AS DOUBLE) / n.n_tokens)
                              * 1000000.0 + 0.5) AS BIGINT) AS tm
            FROM tf JOIN n ON tf.doc_id = n.doc_id
        )
        SELECT doc_id, n_tokens,
               floor((-(CAST(sum(tm) AS DOUBLE) / 1000000.0))
                     * 1000000.0 + 0.5) / 1000000.0 AS entropy
        FROM t GROUP BY doc_id, n_tokens
    """,
        "exact_dedup": """
            SELECT md5(text) AS fingerprint,
                   min(doc_id) AS keep_doc_id,
                   count(*) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "minhash_signatures": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toks)
            ), seeds AS (SELECT unnest(generate_series(0, 11)) AS seed)
            SELECT doc_id, CAST(seed AS INTEGER) AS seed,
                   min(md5(seed || ':' || shingle)) AS mh
            FROM sh CROSS JOIN seeds GROUP BY doc_id, seed
        """,
        "minhash_lsh_pairs": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toks)
            ), seeds AS (SELECT unnest(generate_series(0, 11)) AS seed),
            mh AS (
                SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS mh
                FROM sh CROSS JOIN seeds GROUP BY doc_id, seed
            ), bands AS (
                SELECT doc_id, seed // 3 AS band,
                       md5(string_agg(mh, '' ORDER BY seed)) AS sig
                FROM mh GROUP BY doc_id, seed // 3
            )
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        """,
        "minhash_jaccard_estimate": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toks)
            ), seeds AS (SELECT unnest(generate_series(0, 11)) AS seed),
            mh AS (
                SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS mh
                FROM sh CROSS JOIN seeds GROUP BY doc_id, seed
            ), bands AS (
                SELECT doc_id, seed // 3 AS band,
                       md5(string_agg(mh, '' ORDER BY seed)) AS sig
                FROM mh GROUP BY doc_id, seed // 3
            ), pairs AS (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
            ), eq AS (
                SELECT p.doc_a, p.doc_b,
                       CAST(sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_eq
                FROM pairs p
                JOIN mh x ON x.doc_id = p.doc_a
                JOIN mh y ON y.doc_id = p.doc_b AND y.seed = x.seed
                GROUP BY 1, 2
            ), sizes AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
            ), inter AS (
                SELECT p.doc_a, p.doc_b, count(*) AS c
                FROM pairs p
                JOIN sh s1 ON s1.doc_id = p.doc_a
                JOIN sh s2 ON s2.doc_id = p.doc_b
                          AND s2.shingle = s1.shingle
                GROUP BY 1, 2
            ), m AS (
                SELECT e.doc_a, e.doc_b, e.n_eq,
                       floor((e.n_eq / 12) * 1000000.0 + 0.5) / 1000000.0
                           AS est_jaccard,
                       floor((CAST(coalesce(i.c, 0) AS BIGINT)
                              / (sa.n + sb.n - coalesce(i.c, 0)))
                             * 1000000.0 + 0.5) / 1000000.0 AS exact_jaccard
                FROM eq e
                LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
                JOIN sizes sa ON sa.doc_id = e.doc_a
                JOIN sizes sb ON sb.doc_id = e.doc_b
            )
            SELECT doc_a, doc_b, n_eq, est_jaccard, exact_jaccard,
                   floor(abs(est_jaccard - exact_jaccard) * 1000000.0 + 0.5)
                       / 1000000.0 AS abs_err
            FROM m
        """,
        "simhash_fingerprints": """
            WITH tf AS (
                SELECT doc_id, word, count(*) AS tf,
                       ('0x' || substr(md5(word), 1, 4))::BIGINT AS h
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                      FROM documents)
                WHERE word <> '' GROUP BY doc_id, word
            ), votes AS (
                SELECT doc_id, j, sum(tf * (2 * ((h >> j) & 1) - 1)) AS s
                FROM tf CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) bits
                GROUP BY doc_id, j
            )
            SELECT doc_id,
                   CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
            FROM votes GROUP BY doc_id
        """,
        "simhash_neardup_pairs": """
            WITH tf AS (
                SELECT doc_id, word, count(*) AS tf,
                       ('0x' || substr(md5(word), 1, 4))::BIGINT AS h
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                      FROM documents)
                WHERE word <> '' GROUP BY doc_id, word
            ), votes AS (
                SELECT doc_id, j, sum(tf * (2 * ((h >> j) & 1) - 1)) AS s
                FROM tf CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) bits
                GROUP BY doc_id, j
            ), fp AS (
                SELECT doc_id,
                       CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
                FROM votes GROUP BY doc_id
            ), g AS (
                SELECT simhash, count(*) AS n FROM fp GROUP BY simhash
            )
            -- value-level summary: all-pairs over DISTINCT fingerprints is
            -- exact here; banding is recall-complete at hamming <= 3
            -- (pigeonhole), so the Spark banded plan finds the same pairs
            SELECT simhash AS fp_a, simhash AS fp_b,
                   CAST(0 AS BIGINT) AS hamming,
                   CAST(n * (n - 1) // 2 AS BIGINT) AS n_pairs
            FROM g WHERE n > 1
            UNION ALL
            SELECT a.simhash AS fp_a, b.simhash AS fp_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming,
                   CAST(a.n * b.n AS BIGINT) AS n_pairs
            FROM g a JOIN g b ON a.simhash < b.simhash
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
        """,
        "ngram_jaccard_pairs": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toks)
            ), sizes AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
            FROM inter
            JOIN sizes x ON doc_a = x.doc_id
            JOIN sizes y ON doc_b = y.doc_id
            WHERE floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5) / 1000000.0 >= 0.1
        """,
        "boilerplate_ngrams": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toks)
            ), thr AS (
                -- ceil(1% of corpus) with a floor of 5, pure integers
                SELECT greatest(5, (count(*) + 99) // 100) AS thr
                FROM documents
            ), dfq AS (
                SELECT shingle, count(*) AS df FROM sh GROUP BY 1
            )
            SELECT shingle, df FROM dfq, thr WHERE df >= thr
        """,
        "boilerplate_coverage": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toks)
            ), thr AS (
                SELECT greatest(5, (count(*) + 99) // 100) AS thr
                FROM documents
            ), boiler AS (
                SELECT shingle
                FROM (SELECT shingle, count(*) AS df FROM sh GROUP BY 1), thr
                WHERE df >= thr
            ), sizes AS (
                SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1
            ), hits AS (
                SELECT doc_id, count(*) AS n_boiler FROM sh
                WHERE shingle IN (SELECT shingle FROM boiler) GROUP BY 1
            )
            SELECT s.doc_id, s.n_shingles,
                   coalesce(h.n_boiler, 0) AS n_boiler,
                   CAST(floor(coalesce(h.n_boiler, 0) / s.n_shingles
                              * 1000000.0 + 0.5) / 1000000.0 AS DOUBLE)
                       AS coverage
            FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id
        """,
        "blocklist_scrub": """
            WITH t AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            )
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CAST(len(list_filter(toks,
                        x -> x IN ('slow','dup','big'))) AS BIGINT) AS n_hits,
                   md5(array_to_string(list_filter(toks,
                        x -> NOT x IN ('slow','dup','big')), ' '))
                       AS scrub_md5,
                   CAST(CASE WHEN 20 * len(list_filter(toks,
                                 x -> x IN ('slow','dup','big'))) < len(toks)
                        THEN 1 ELSE 0 END AS BIGINT) AS keep_flag
            FROM t
        """,
        "source_vocab_overlap": """
            WITH v AS (
                SELECT DISTINCT source, token
                FROM (SELECT source,
                             unnest(string_split(text, ' ')) AS token
                      FROM documents)
            ), sizes AS (
                SELECT source, count(*) AS n FROM v GROUP BY 1
            ), pairs AS (
                SELECT a.source AS src_a, b.source AS src_b, count(*) AS c
                FROM v a JOIN v b
                  ON a.token = b.token AND a.source < b.source
                GROUP BY 1, 2
            )
            SELECT src_a, src_b, sa.n AS n_a, sb.n AS n_b, c,
                   CAST(floor(c / (sa.n + sb.n - c) * 1000000.0 + 0.5)
                        / 1000000.0 AS DOUBLE) AS jaccard
            FROM pairs
            JOIN sizes sa ON pairs.src_a = sa.source
            JOIN sizes sb ON pairs.src_b = sb.source
        """,
        "quality_weighted_sample": """
            WITH tok AS (
                SELECT doc_id,
                       count(*) AS n_tokens,
                       floor((CAST(sum(CASE WHEN word IN ('the','a','is','what','it','and','of','to','in')
                                      THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS stopword_ratio,
                       floor((count(DISTINCT word) * 1.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS distinct_ratio
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                      FROM documents)
                GROUP BY doc_id
            ), q AS (
                SELECT doc_id,
                       floor((least(n_tokens / 100.0, 1.0) * 0.4
                             + distinct_ratio * 0.4
                             + (1 - stopword_ratio) * 0.2) * 1000000.0 + 0.5)
                           / 1000000.0 AS quality_score,
                       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                           % 1000000 AS u
                FROM tok
            )
            SELECT doc_id, quality_score, u FROM q
            WHERE u < CAST(floor(quality_score * 1000000.0 + 0.5) AS BIGINT)
        """,
        "embedding_norms_arrow": """
            SELECT vec_id,
                   floor((sqrt(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0)) * 1000000.0 + 0.5) / 1000000.0 AS l2_norm
            FROM (SELECT vec_id, embedding,
                         unnest(generate_series(1, len(embedding))) AS i
                  FROM embeddings)
            GROUP BY vec_id
        """,
        "embedding_gram_matrix": """
            WITH comp AS (
                SELECT vec_id,
                       generate_subscripts(embedding, 1) AS i,
                       unnest(embedding) AS x
                FROM embeddings
            )
            SELECT a.i AS i, b.i AS j,
                   sum(CAST(floor(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)
                                  * 1000000.0 + 0.5) AS BIGINT))
                       AS gram_micros
            FROM comp a JOIN comp b
              ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY a.i, b.i
        """,
        "event_type_melt": """
            SELECT user_id, event_type,
                   floor((CAST(sum(CAST(floor(value * 1000000.0 + 0.5)
                                       AS BIGINT)) AS DOUBLE) / 1000000.0)
                         * 1000000.0 + 0.5) / 1000000.0 AS total_value
            FROM events
            WHERE event_type IN ('click','view','purchase','signup','error')
            GROUP BY user_id, event_type
        """,
        "sliding_wau": """
            WITH ud AS (
                SELECT DISTINCT user_id,
                       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
                FROM events
            ), bounds AS (
                SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS lo,
                       CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS hi
                FROM events
            ), spine AS (
                SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))
                           AS day
                FROM bounds
            ), contrib AS (
                SELECT DISTINCT user_id,
                       day + k * INTERVAL 1 DAY AS day
                FROM ud, (SELECT unnest(generate_series(0, 6)) AS k)
            ), wau AS (
                SELECT day, count(*) AS wau FROM contrib GROUP BY 1
            )
            SELECT s.day, coalesce(w.wau, 0) AS wau
            FROM spine s LEFT JOIN wau w ON s.day = w.day
        """,
        "incoming_batch_dedup": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toks)
            ), seeds AS (SELECT unnest(generate_series(0, 11)) AS seed),
            mh AS (
                SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS mh
                FROM sh CROSS JOIN seeds GROUP BY doc_id, seed
            ), bands AS (
                SELECT doc_id, seed // 3 AS band,
                       md5(string_agg(mh, '' ORDER BY seed)) AS sig
                FROM mh GROUP BY doc_id, seed // 3
            ), inc AS (
                SELECT doc_id FROM documents WHERE source = 'src0'
            ), exact_hit AS (
                SELECT i.doc_id FROM documents i
                WHERE i.source = 'src0'
                  AND md5(i.text) IN (SELECT md5(text) FROM documents
                                      WHERE source <> 'src0')
            ), near_hit AS (
                SELECT DISTINCT bi.doc_id
                FROM bands bi
                JOIN bands bc ON bi.band = bc.band AND bi.sig = bc.sig
                WHERE bi.doc_id IN (SELECT doc_id FROM inc)
                  AND bc.doc_id NOT IN (SELECT doc_id FROM inc)
            )
            SELECT i.doc_id,
                   CAST(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END
                        AS BIGINT) AS is_exact_dup,
                   CAST(CASE WHEN n.doc_id IS NOT NULL THEN 1 ELSE 0 END
                        AS BIGINT) AS is_near_dup
            FROM inc i
            LEFT JOIN exact_hit e ON i.doc_id = e.doc_id
            LEFT JOIN near_hit n ON i.doc_id = n.doc_id
        """,
        "neardup_triangles": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toks)
            ), seeds AS (SELECT unnest(generate_series(0, 11)) AS seed),
            mh AS (
                SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS mh
                FROM sh CROSS JOIN seeds GROUP BY doc_id, seed
            ), bands AS (
                SELECT doc_id, seed // 3 AS band,
                       md5(string_agg(mh, '' ORDER BY seed)) AS sig
                FROM mh GROUP BY doc_id, seed // 3
            ), edges AS (
                SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.sig = b.sig
                     AND a.doc_id < b.doc_id
            ), tri AS (
                SELECT e1.a AS a, e1.b AS b, e2.b AS c
                FROM edges e1
                JOIN edges e2 ON e2.a = e1.b
                JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
            ), corners AS (
                SELECT unnest([a, b, c]) AS doc_id FROM tri
            ), pn AS (
                SELECT doc_id, count(*) AS n_triangles
                FROM corners GROUP BY 1
            )
            SELECT d.doc_id, coalesce(pn.n_triangles, 0) AS n_triangles
            FROM documents d LEFT JOIN pn ON d.doc_id = pn.doc_id
        """,
        "curation_funnel": """
            WITH toksl AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), bl AS (
                SELECT doc_id,
                       CASE WHEN 20 * len(list_filter(toks,
                            x -> x IN ('slow','dup','big'))) < len(toks)
                       THEN 1 ELSE 0 END AS keep_flag
                FROM toksl
            ), tok AS (
                SELECT doc_id,
                       count(*) AS n_tokens,
                       floor((CAST(sum(CASE WHEN word IN ('the','a','is','what','it','and','of','to','in')
                                      THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS stopword_ratio,
                       floor((count(DISTINCT word) * 1.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS distinct_ratio
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                      FROM documents)
                GROUP BY doc_id
            ), q AS (
                SELECT doc_id,
                       floor((least(n_tokens / 100.0, 1.0) * 0.4
                             + distinct_ratio * 0.4
                             + (1 - stopword_ratio) * 0.2) * 1000000.0 + 0.5)
                           / 1000000.0 AS quality_score
                FROM tok
            ), reps AS (
                SELECT min(doc_id) AS doc_id FROM documents
                GROUP BY md5(text)
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toksl)
            ), seeds AS (SELECT unnest(generate_series(0, 11)) AS seed),
            mh AS (
                SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS mh
                FROM sh CROSS JOIN seeds GROUP BY doc_id, seed
            ), bands AS (
                SELECT doc_id, seed // 3 AS band,
                       md5(string_agg(mh, '' ORDER BY seed)) AS sig
                FROM mh GROUP BY doc_id, seed // 3
            ), droppedd AS (
                SELECT DISTINCT b.doc_id
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.sig = b.sig
                     AND a.doc_id < b.doc_id
            ), flags AS (
                SELECT d.doc_id,
                       (bl.keep_flag = 1) AS s2,
                       (q.quality_score >= 0.5) AS qq,
                       (d.doc_id IN (SELECT doc_id FROM reps)) AS r,
                       (d.doc_id NOT IN (SELECT doc_id FROM droppedd)) AS nd
                FROM documents d
                JOIN bl ON d.doc_id = bl.doc_id
                JOIN q ON d.doc_id = q.doc_id
            ), agg AS (
                SELECT count(*) AS n1,
                       sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS n2,
                       sum(CASE WHEN s2 AND qq THEN 1 ELSE 0 END) AS n3,
                       sum(CASE WHEN s2 AND qq AND r THEN 1 ELSE 0 END) AS n4,
                       sum(CASE WHEN s2 AND qq AND r AND nd THEN 1 ELSE 0 END) AS n5
                FROM flags
            ), stages AS (
                SELECT '1_total' AS stage, n1 AS n_docs, n1 AS total FROM agg
                UNION ALL SELECT '2_blocklist', n2, n1 FROM agg
                UNION ALL SELECT '3_quality', n3, n1 FROM agg
                UNION ALL SELECT '4_exact', n4, n1 FROM agg
                UNION ALL SELECT '5_neardup', n5, n1 FROM agg
            )
            SELECT stage, n_docs,
                   CAST(floor(n_docs / total * 1000000.0 + 0.5) / 1000000.0
                        AS DOUBLE) AS pct_of_total
            FROM stages
        """,
        "gap_filled_hourly": """
            WITH hourly AS (
                SELECT date_trunc('hour', ts) AS hour,
                       count(*) AS n_events,
                       sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
                           AS value_micros
                FROM events GROUP BY 1
            ), bounds AS (
                SELECT date_trunc('hour', min(ts)) AS lo,
                       date_trunc('hour', max(ts)) AS hi
                FROM events
            ), spine AS (
                SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                           AS hour
                FROM bounds
            )
            SELECT s.hour,
                   coalesce(h.n_events, 0) AS n_events,
                   CAST(CASE WHEN h.n_events IS NULL THEN 1 ELSE 0 END
                        AS BIGINT) AS is_gap,
                   last_value(h.value_micros IGNORE NULLS)
                       OVER (ORDER BY s.hour
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS ff_value_micros
            FROM spine s LEFT JOIN hourly h ON s.hour = h.hour
        """,
        "cohort_retention": """
            WITH cohorts AS (
                -- DuckDB date_trunc('week') yields DATE; cast back to
                -- TIMESTAMP to match Spark's timestamp truncation
                SELECT user_id,
                       CAST(date_trunc('week', min(ts)) AS TIMESTAMP)
                           AS cohort_week
                FROM events GROUP BY 1
            ), active AS (
                SELECT DISTINCT user_id,
                       CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
                FROM events
            ), matrix AS (
                SELECT c.cohort_week,
                       date_diff('day', c.cohort_week, a.week) // 7
                           AS week_offset,
                       count(*) AS n_active
                FROM active a JOIN cohorts c ON a.user_id = c.user_id
                GROUP BY 1, 2
            ), base AS (
                SELECT cohort_week, count(*) AS cohort_size
                FROM cohorts GROUP BY 1
            )
            SELECT m.cohort_week, m.week_offset, m.n_active, b.cohort_size,
                   CAST(floor(m.n_active / b.cohort_size * 1000000.0 + 0.5)
                        / 1000000.0 AS DOUBLE) AS retention
            FROM matrix m JOIN base b ON m.cohort_week = b.cohort_week
        """,
        "media_resize_digest": """
            WITH base AS (
                SELECT doc_id, text, length(text) AS n FROM documents
            ), resized AS (
                SELECT doc_id, n, text AS r FROM base WHERE n <= 64
                UNION ALL
                -- stride sampler: byte int(i * n/64) for i in 0..63;
                -- int() truncation == floor for non-negative doubles,
                -- and i * (n / 64.0) mirrors Python's op order exactly
                SELECT doc_id, n,
                       string_agg(substring(text,
                           CAST(floor(i * (n / CAST(64 AS DOUBLE)))
                                AS INT) + 1, 1), '' ORDER BY i) AS r
                FROM (SELECT doc_id, text, n,
                             unnest(generate_series(0, 63)) AS i
                      FROM base WHERE n > 64)
                GROUP BY doc_id, n
            )
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS media_type,
                   CAST(n AS BIGINT) AS orig_bytes,
                   CAST(length(r) AS BIGINT) AS n_bytes_resized,
                   md5(r) AS resize_md5
            FROM resized
        """,
        "frame_sample_digest": """
            WITH frames AS (
                SELECT doc_id, text,
                       unnest(generate_series(0,
                           CAST(ceil(length(text) / CAST(64 AS DOUBLE))
                                AS INT) - 1)) AS frame_no
                FROM documents
            )
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS media_type,
                   CAST(frame_no AS BIGINT) AS frame_no,
                   CAST(length(substring(text, frame_no * 64 + 1, 64))
                        AS BIGINT) AS chunk_bytes,
                   md5(substring(text, frame_no * 64 + 1, 64)) AS chunk_md5
            FROM frames
        """,
        "bpe_pair_counts": """
            WITH t AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), p AS (
                SELECT toks[pos] || ' ' || toks[pos+1] AS pair
                FROM (SELECT toks,
                             unnest(generate_series(1, len(toks) - 1)) AS pos
                      FROM t WHERE len(toks) >= 2)
            ), c AS (
                SELECT pair, count(*) AS n FROM p GROUP BY 1
            )
            SELECT pair, n,
                   row_number() OVER (ORDER BY n DESC, pair) AS rank
            FROM c
        """,
        "user_path_trigrams": """
            WITH s AS (
                SELECT event_type || '>' || lead(event_type, 1) OVER w
                       || '>' || lead(event_type, 2) OVER w AS path,
                       lead(event_type, 2) OVER w AS t3
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT path, count(*) AS n FROM s
            WHERE t3 IS NOT NULL GROUP BY 1
        """,
        "hourly_anomaly_scores": """
            WITH hourly AS (
                SELECT date_trunc('hour', ts) AS hour, count(*) AS n
                FROM events GROUP BY 1
            ), win AS (
                SELECT hour, n,
                       sum(n) OVER w AS s,
                       sum(n * n) OVER w AS s2,
                       count(*) OVER w AS k
                FROM hourly
                WINDOW w AS (ORDER BY hour
                             ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
            )
            SELECT hour, n,
                   CASE WHEN k = 24
                             AND (k * s2 - s * s) * 1.0 / (k * k) > 0
                        THEN floor(((n - s * 1.0 / k)
                                    / sqrt((k * s2 - s * s) * 1.0 / (k * k)))
                                   * 1000000.0 + 0.5) / 1000000.0
                   END AS zscore
            FROM win WHERE k = 24
        """,
        "unigram_logprob_scores": """
            WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS word
                FROM documents
            ), t AS (SELECT doc_id, word FROM toks WHERE word <> ''),
            freq AS (
                SELECT word, count(*) AS cnt FROM t GROUP BY word
            ), total AS (SELECT count(*) AS tot FROM t)
            SELECT doc_id,
                   count(*) AS n_tokens,
                   floor(((CAST(sum(CAST(floor(ln(cnt * 1.0 / total.tot) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_logprob
            FROM t JOIN freq USING (word) CROSS JOIN total
            GROUP BY doc_id
        """,
        "ngram_containment_pairs": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toks)
            ), sizes AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   floor((c * 1.0 / x.n) * 1000000.0 + 0.5) / 1000000.0 AS containment_a,
                   floor((c * 1.0 / y.n) * 1000000.0 + 0.5) / 1000000.0 AS containment_b,
                   floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
            FROM inter
            JOIN sizes x ON doc_a = x.doc_id
            JOIN sizes y ON doc_b = y.doc_id
            WHERE greatest(
                floor((c * 1.0 / x.n) * 1000000.0 + 0.5) / 1000000.0,
                floor((c * 1.0 / y.n) * 1000000.0 + 0.5) / 1000000.0) >= 0.4
        """,
        "session_window_rollup": """
            WITH flagged AS (
                SELECT user_id, ts, event_id, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR ts > lag(ts) OVER w + INTERVAL '30 minutes'
                            THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sessions AS (
                SELECT user_id, ts, value,
                       sum(is_new) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS session_id
                FROM flagged
            )
            SELECT user_id,
                   min(ts) AS session_start,
                   max(ts) AS last_event_ts,
                   count(*) AS n_events,
                   floor((CAST(sum(CAST(floor((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS session_value
            FROM sessions GROUP BY user_id, session_id
        """,
        "tfidf_top_terms": """
            WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS word
                FROM documents
            ), tf AS (
                SELECT doc_id, word, count(*) AS tf FROM toks
                WHERE word <> '' GROUP BY doc_id, word
            ), df AS (
                SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY word
            ), n AS (SELECT count(*) AS n_docs FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.word, tf.tf, df.df,
                       floor((tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df)) * 1000000.0 + 0.5) / 1000000.0 AS tfidf
                FROM tf JOIN df USING (word) CROSS JOIN n
            )
            SELECT doc_id, word, tf, df, tfidf, rk FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id ORDER BY tfidf DESC, word
                ) AS rk FROM scored
            ) WHERE rk <= 3
        """,
        "bm25_top_terms": """
            WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS word
                FROM documents
            ), tf AS (
                SELECT doc_id, word, count(*) AS tf FROM toks
                WHERE word <> '' GROUP BY doc_id, word
            ), dl AS (
                SELECT doc_id, count(*) AS dl FROM toks
                WHERE word <> '' GROUP BY doc_id
            ), df AS (
                SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY word
            ), n AS (SELECT count(*) AS n_docs FROM documents),
            avg_t AS (
                SELECT CAST(sum(dl) AS BIGINT) / count(*) AS avgdl FROM dl
            ), scored AS (
                SELECT tf.doc_id, tf.word, tf.tf, df.df, dl.dl,
                       -- every fractional literal cast to DOUBLE: a bare
                       -- 2.2 is DECIMAL in DuckDB and BIGINT*DECIMAL stays
                       -- exact-decimal, off the IEEE product by 1 ulp for
                       -- odd tf (ADVICE r2) — Spark computes doubles
                       floor(((ln((CAST(n.n_docs AS DOUBLE) - df.df + 0.5)
                                  / (df.df + 0.5) + 1.0)
                               * (tf.tf * CAST(2.2 AS DOUBLE)))
                              / (tf.tf + CAST(1.2 AS DOUBLE)
                                 * (0.25 + (CAST(0.75 AS DOUBLE) * dl.dl)
                                           / avg_t.avgdl)))
                             * 1000000.0 + 0.5) / 1000000.0 AS bm25
                FROM tf
                JOIN df USING (word)
                JOIN dl USING (doc_id)
                CROSS JOIN n CROSS JOIN avg_t
            )
            SELECT doc_id, word, tf, df, dl, bm25, rk FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id ORDER BY bm25 DESC, word
                ) AS rk FROM scored
            ) WHERE rk <= 3
        """,
        "dedup_clusters": """
            WITH RECURSIVE toks AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toks)
            ), sizes AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ), edges AS (
                SELECT doc_a, doc_b FROM inter
                JOIN sizes x ON doc_a = x.doc_id
                JOIN sizes y ON doc_b = y.doc_id
                WHERE floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5) / 1000000.0 >= 0.1
            ), bidir AS (
                SELECT doc_a AS s, doc_b AS d FROM edges
                UNION SELECT doc_b, doc_a FROM edges
            ), walk(doc, reach) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT w.doc, b.d FROM walk w JOIN bidir b ON w.reach = b.s
            )
            SELECT doc AS doc_id, min(reach) AS cluster_id
            FROM walk GROUP BY doc
        """,
        "neardup_random_walks": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toks)
            ), sizes AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ), ed AS MATERIALIZED (
                SELECT doc_a, doc_b FROM inter
                JOIN sizes x ON doc_a = x.doc_id
                JOIN sizes y ON doc_b = y.doc_id
                WHERE floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5)
                      / 1000000.0 >= 0.1
            ), und AS MATERIALIZED (
                SELECT doc_a, doc_b FROM ed
                UNION ALL
                SELECT doc_b AS doc_a, doc_a AS doc_b FROM ed
            ), adj AS MATERIALIZED (
                SELECT doc_a AS node,
                       list_sort(list(DISTINCT doc_b)) AS nbrs
                FROM und GROUP BY doc_a
            ), w0 AS MATERIALIZED (
                SELECT node, walk, node AS cur, [node] AS path
                FROM adj CROSS JOIN
                     (SELECT unnest(generate_series(0, 1)) AS walk)
            )__WALK_STEPS__
            SELECT node AS start_node, CAST(walk AS BIGINT) AS walk,
                   array_to_string(path, '>') AS path,
                   cur AS end_node
            FROM w3
        """.replace("__WALK_STEPS__", walk_steps),
        "walk_skipgram_pairs": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toks)
            ), sizes AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ), ed AS MATERIALIZED (
                SELECT doc_a, doc_b FROM inter
                JOIN sizes x ON doc_a = x.doc_id
                JOIN sizes y ON doc_b = y.doc_id
                WHERE floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5)
                      / 1000000.0 >= 0.1
            ), und AS MATERIALIZED (
                SELECT doc_a, doc_b FROM ed
                UNION ALL
                SELECT doc_b AS doc_a, doc_a AS doc_b FROM ed
            ), adj AS MATERIALIZED (
                SELECT doc_a AS node,
                       list_sort(list(DISTINCT doc_b)) AS nbrs
                FROM und GROUP BY doc_a
            ), w0 AS MATERIALIZED (
                SELECT node, walk, node AS cur, [node] AS path
                FROM adj CROSS JOIN
                     (SELECT unnest(generate_series(0, 1)) AS walk)
            )__WALK_STEPS__, adjpairs AS (
                SELECT path[i] AS a, path[i + 1] AS b
                FROM w3, unnest(generate_series(1, len(path) - 1)) AS t(i)
            ), bi AS (
                SELECT a AS center, b AS context FROM adjpairs
                UNION ALL
                SELECT b AS center, a AS context FROM adjpairs
            )
            SELECT center, context, count(*) AS n
            FROM bi GROUP BY 1, 2
        """.replace("__WALK_STEPS__", walk_steps),
        "mixture_allocation": """
            WITH per_src AS (
                SELECT source,
                       CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                           AS n_tokens
                FROM documents GROUP BY source
            ), m AS (
                SELECT source, n_tokens,
                       CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))
                                  * 1000000.0 + 0.5) AS BIGINT) AS mass
                FROM per_src
            ), a AS (
                SELECT source, n_tokens,
                       CAST(1000000 AS BIGINT) * mass
                           // (SELECT sum(mass) FROM m) AS target_tokens
                FROM m
            )
            SELECT source, n_tokens, target_tokens,
                   floor((CAST(target_tokens AS DOUBLE) / n_tokens)
                         * 1000000.0 + 0.5) / 1000000.0 AS epoch_factor
            FROM a
        """,
        "truncation_report": """
            WITH d AS (
                SELECT lang,
                       CAST(len(string_split(text, ' ')) AS BIGINT)
                           AS n_tokens,
                       greatest(CAST(len(string_split(text, ' ')) AS BIGINT)
                                - 128, 0) AS lost
                FROM documents
            )
            SELECT lang,
                   count(*) AS n_docs,
                   CAST(sum(CASE WHEN lost > 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_truncated,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                   CAST(sum(lost) AS BIGINT) AS tokens_lost,
                   floor((CAST(sum(lost) AS DOUBLE) / sum(n_tokens))
                         * 1000000.0 + 0.5) / 1000000.0 AS lost_frac
            FROM d GROUP BY lang
        """,
        "clipped_value_stats": """
            WITH b AS (
                SELECT event_type,
                       quantile_cont(value, 0.01) AS p_lo,
                       quantile_cont(value, 0.99) AS p_hi
                FROM events GROUP BY event_type
            ), c AS (
                SELECT e.event_type, b.p_lo, b.p_hi,
                       CASE WHEN e.value < b.p_lo THEN 1 ELSE 0 END AS is_lo,
                       CASE WHEN e.value > b.p_hi THEN 1 ELSE 0 END AS is_hi,
                       CAST(floor(greatest(least(e.value, b.p_hi), b.p_lo)
                                  * 1000000.0 + 0.5) AS BIGINT) AS cv
                FROM events e JOIN b ON e.event_type = b.event_type
            )
            SELECT event_type,
                   floor(min(p_lo) * 1000000.0 + 0.5) / 1000000.0 AS p01,
                   floor(min(p_hi) * 1000000.0 + 0.5) / 1000000.0 AS p99,
                   CAST(sum(is_lo) AS BIGINT) AS n_clipped_lo,
                   CAST(sum(is_hi) AS BIGINT) AS n_clipped_hi,
                   count(*) AS n,
                   floor(((CAST(sum(cv) AS DOUBLE) / 1000000.0) / count(*))
                         * 1000000.0 + 0.5) / 1000000.0 AS clipped_mean
            FROM c GROUP BY event_type
        """,
        "value_histogram": """
            SELECT event_type,
                   least(greatest(CAST(floor(value / 10.0) AS BIGINT), 0), 9)
                       AS bin,
                   count(*) AS n
            FROM events
            GROUP BY 1, 2
        """,
        "prefix_filter_jaccard_pairs": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toks)
            ), sizes AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
            FROM inter
            JOIN sizes x ON doc_a = x.doc_id
            JOIN sizes y ON doc_b = y.doc_id
            WHERE floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5) / 1000000.0 >= 0.5
        """,
        "orders_column_profile": """
            SELECT 'o_orderstatus' AS column_name,
                   CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                   count(DISTINCT o_orderstatus) AS n_distinct,
                   min(CAST(o_orderstatus AS VARCHAR)) AS min_value,
                   max(CAST(o_orderstatus AS VARCHAR)) AS max_value
            FROM orders
            UNION ALL
            SELECT 'o_orderpriority',
                   CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   count(DISTINCT o_orderpriority),
                   min(CAST(o_orderpriority AS VARCHAR)),
                   max(CAST(o_orderpriority AS VARCHAR))
            FROM orders
            UNION ALL
            SELECT 'o_custkey',
                   CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   count(DISTINCT o_custkey),
                   min(CAST(o_custkey AS VARCHAR)),
                   max(CAST(o_custkey AS VARCHAR))
            FROM orders
        """,
        "bpe_train_merges": """
            WITH raw0 AS (
                SELECT doc_id,
                       unnest(string_split(text, ' ')) AS tok,
                       unnest(generate_series(1,
                           len(string_split(text, ' ')))) AS p
                FROM documents
            ), s0 AS MATERIALIZED (
                SELECT doc_id,
                       row_number() OVER (PARTITION BY doc_id ORDER BY p)
                           AS pos,
                       tok
                FROM raw0 WHERE tok <> ''
            )__BPE_STEPS__
            SELECT CAST(1 AS BIGINT) AS step, pair, pair_count,
                   (SELECT count(*) FROM s1) AS n_tokens_after
            FROM top1
            UNION ALL
            SELECT CAST(2 AS BIGINT) AS step, pair, pair_count,
                   (SELECT count(*) FROM s2) AS n_tokens_after
            FROM top2
        """.replace("__BPE_STEPS__", bpe_steps),
        "event_type_stats_pipe": """
            SELECT event_type, count(*) AS n,
                   sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
                       AS sum_value_micros
            FROM events
            WHERE value > 50.0
            GROUP BY event_type
        """,
        "user_recency_scores": """
            WITH a AS (SELECT max(ts) AS m FROM events)
            SELECT user_id,
                   count(*) AS n_events,
                   sum(CAST(floor(exp(-(CAST(epoch_us(a.m) - epoch_us(ts)
                                             AS DOUBLE) / 86400000000.0))
                                  * 1000000.0 + 0.5) AS BIGINT))
                       AS recency_micros
            FROM events CROSS JOIN a
            GROUP BY user_id
        """,
        "lang_source_listagg": """
            SELECT lang,
                   count(*) AS n_docs,
                   string_agg(DISTINCT source, ',' ORDER BY source)
                       AS sources
            FROM documents
            GROUP BY lang
        """,
        "sql_udf_lang_stats": """
            SELECT lang,
                   count(*) AS n_docs,
                   floor((CAST(sum(n_chars) AS DOUBLE) / count(*))
                         * 1000000.0 + 0.5) / 1000000.0 AS avg_chars,
                   floor((CAST(sum(length(text)) AS DOUBLE) / count(*))
                         * 1000000.0 + 0.5) / 1000000.0 AS avg_text_len
            FROM documents
            GROUP BY lang
        """,
        "neardup_reach_rcte": """
            WITH RECURSIVE toks AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toks)
            ), sizes AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ), ed AS MATERIALIZED (
                SELECT doc_a, doc_b FROM inter
                JOIN sizes x ON doc_a = x.doc_id
                JOIN sizes y ON doc_b = y.doc_id
                WHERE floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5)
                      / 1000000.0 >= 0.1
            ), walk(src, dst, depth) AS (
                SELECT doc_a, doc_b, 1 FROM ed
                UNION ALL
                SELECT w.src, e.doc_b, w.depth + 1
                FROM walk w JOIN ed e ON w.dst = e.doc_a
                WHERE w.depth < 10
            )
            SELECT src AS doc_id,
                   CAST(count(DISTINCT dst) AS BIGINT) AS n_reachable,
                   CAST(max(depth) AS BIGINT) AS max_chain
            FROM walk GROUP BY src
        """,
        "neardup_kcore": f"""
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toks)
            ), sizes AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ), ed AS (
                SELECT doc_a, doc_b
                FROM inter
                JOIN sizes x ON doc_a = x.doc_id
                JOIN sizes y ON doc_b = y.doc_id
                WHERE floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5)
                      / 1000000.0 >= 0.1
            ), und0 AS MATERIALIZED (
                SELECT doc_a, doc_b FROM ed
                UNION ALL
                SELECT doc_b AS doc_a, doc_a AS doc_b FROM ed
            ){kcore_rounds}
            SELECT doc_a AS doc_id,
                   CAST(count(*) AS BIGINT) AS core_degree
            FROM und8 GROUP BY doc_a
        """,
        "neardup_pagerank": f"""
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toks)
            ), sizes AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ), edges AS (
                SELECT doc_a, doc_b FROM inter
                JOIN sizes x ON doc_a = x.doc_id
                JOIN sizes y ON doc_b = y.doc_id
                WHERE floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5) / 1000000.0 >= 0.1
            ), bidir AS (
                SELECT doc_a AS s, doc_b AS d FROM edges
                UNION SELECT doc_b, doc_a FROM edges
            ), deg AS (
                SELECT s AS src, count(*) AS deg FROM bidir GROUP BY 1
            ), n AS (SELECT count(*) AS n_docs FROM documents),
            r0 AS (
                SELECT doc_id,
                       floor((1.0 / n.n_docs) * 1000000000.0 + 0.5)
                           / 1000000000.0 AS pr
                FROM documents CROSS JOIN n
            ){pagerank_iters}
            SELECT doc_id, pr AS pagerank FROM r5
        """,
        "order_price_quantiles": """
            SELECT o_orderpriority,
                   floor((quantile_cont(o_totalprice, 0.5)) * 1000000.0 + 0.5) / 1000000.0 AS p50,
                   floor((quantile_cont(o_totalprice, 0.9)) * 1000000.0 + 0.5) / 1000000.0 AS p90,
                   count(*) AS n
            FROM orders GROUP BY o_orderpriority
        """,
        "sliding_window_counts": """
            SELECT w_start, count(*) AS n, floor((CAST(sum(CAST(floor((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS total_value
            FROM (
                SELECT unnest([date_trunc('hour', ts),
                               date_trunc('hour', ts) - INTERVAL '1 hour']) AS w_start,
                       value
                FROM events
            ) GROUP BY w_start
        """,
        "continuous_hourly_rollup": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n, floor((CAST(sum(CAST(floor((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "scd2_intervals": """
            SELECT user_id, event_id, value,
                   ts AS valid_from,
                   lead(ts) OVER w AS valid_to,
                   CAST(lead(ts) OVER w IS NULL AS INTEGER) AS is_current
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "orders_audit": """
            SELECT count(*) AS n_rows,
                   CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct_keys,
                   CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_dup_keys,
                   CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_price,
                   CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative_price,
                   min(o_orderdate) AS min_orderdate,
                   max(o_orderdate) AS max_orderdate
            FROM orders
        """,
        "incremental_ingest_dedup": """
            WITH k AS (
                SELECT doc_id, source,
                       md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS fp
                FROM documents
            ), inc AS (
                SELECT doc_id, fp,
                       min(doc_id) OVER (PARTITION BY fp) AS first_in_batch
                FROM k WHERE source = 'src0'
            ), ex AS (SELECT DISTINCT fp FROM k WHERE source <> 'src0')
            SELECT doc_id, fp,
                   CASE WHEN fp IN (SELECT fp FROM ex) THEN 'dup_existing'
                        WHEN doc_id <> first_in_batch THEN 'dup_in_batch'
                        ELSE 'new' END AS status
            FROM inc
        """,
        "curated_corpus": """
            WITH RECURSIVE toks AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toks)
            ), sizes AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ), edges AS (
                SELECT doc_a, doc_b FROM inter
                JOIN sizes x ON doc_a = x.doc_id
                JOIN sizes y ON doc_b = y.doc_id
                WHERE floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5) / 1000000.0 >= 0.1
            ), bidir AS (
                SELECT doc_a AS s, doc_b AS d FROM edges
                UNION SELECT doc_b, doc_a FROM edges
            ), walk(doc, reach) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT w.doc, b.d FROM walk w JOIN bidir b ON w.reach = b.s
            ), clusters AS (
                SELECT doc AS doc_id, min(reach) AS cluster_id
                FROM walk GROUP BY doc
            ), tok AS (
                SELECT doc_id,
                       count(*) AS n_tokens,
                       floor((CAST(sum(CASE WHEN word IN ('the','a','is','what','it','and','of','to','in')
                                      THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS stopword_ratio,
                       floor((count(DISTINCT word) * 1.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS distinct_ratio
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                      FROM documents)
                WHERE word <> '' GROUP BY doc_id
            ), quality AS (
                SELECT doc_id,
                       floor((least(n_tokens / 100.0, 1.0) * 0.4
                             + distinct_ratio * 0.4
                             + (1 - stopword_ratio) * 0.2) * 1000000.0 + 0.5) / 1000000.0 AS quality_score
                FROM tok
            )
            SELECT d.doc_id, d.lang, cl.cluster_id,
                   CAST(d.doc_id = cl.cluster_id AS INTEGER) AS is_representative,
                   q.quality_score,
                   CAST(d.doc_id = cl.cluster_id AND q.quality_score >= 0.5
                        AS INTEGER) AS keep
            FROM documents d
            JOIN quality q ON d.doc_id = q.doc_id
            JOIN clusters cl ON d.doc_id = cl.doc_id
        """,
        "curation_summary": """
            WITH RECURSIVE toks AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toks)
            ), sizes AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ), edges AS (
                SELECT doc_a, doc_b FROM inter
                JOIN sizes x ON doc_a = x.doc_id
                JOIN sizes y ON doc_b = y.doc_id
                WHERE floor((c * 1.0 / (x.n + y.n - c)) * 1000000.0 + 0.5) / 1000000.0 >= 0.1
            ), bidir AS (
                SELECT doc_a AS s, doc_b AS d FROM edges
                UNION SELECT doc_b, doc_a FROM edges
            ), walk(doc, reach) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT w.doc, b.d FROM walk w JOIN bidir b ON w.reach = b.s
            ), clusters AS (
                SELECT doc AS doc_id, min(reach) AS cluster_id
                FROM walk GROUP BY doc
            ), tok AS (
                SELECT doc_id,
                       count(*) AS n_tokens,
                       floor((CAST(sum(CASE WHEN word IN ('the','a','is','what','it','and','of','to','in')
                                      THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS stopword_ratio,
                       floor((count(DISTINCT word) * 1.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS distinct_ratio
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                      FROM documents)
                WHERE word <> '' GROUP BY doc_id
            ), quality AS (
                SELECT doc_id,
                       floor((least(n_tokens / 100.0, 1.0) * 0.4
                             + distinct_ratio * 0.4
                             + (1 - stopword_ratio) * 0.2) * 1000000.0 + 0.5) / 1000000.0 AS quality_score
                FROM tok
            ), curated AS (
                SELECT d.doc_id, d.lang, cl.cluster_id,
                       CAST(d.doc_id = cl.cluster_id AS INTEGER) AS is_representative,
                       q.quality_score,
                       CAST(d.doc_id = cl.cluster_id AND q.quality_score >= 0.5
                            AS INTEGER) AS keep
                FROM documents d
                JOIN quality q ON d.doc_id = q.doc_id
                JOIN clusters cl ON d.doc_id = cl.doc_id
            )
            SELECT lang,
                   count(*) AS n_docs,
                   CAST(sum(keep) AS BIGINT) AS n_kept,
                   CAST(sum(1 - is_representative) AS BIGINT) AS n_dup_dropped,
                   floor((CAST(sum(CAST(floor((CASE WHEN keep = 1 THEN quality_score END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(CASE WHEN keep = 1 THEN quality_score END)) * 1000000.0 + 0.5) / 1000000.0 AS kept_avg_quality
            FROM curated GROUP BY lang
        """,
        "ann_topk_bruteforce": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS q_emb
                FROM embeddings WHERE vec_id < 5
            ), pairs AS (
                SELECT query_id, c.vec_id AS cand_id, q_emb, c.embedding AS c_emb
                FROM q CROSS JOIN embeddings c WHERE c.vec_id <> query_id
            ), sums AS (
                SELECT query_id, cand_id,
                       sum(CAST(floor(CAST(q_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS dot,
                       sum(CAST(floor(CAST(q_emb[i] AS DOUBLE) * CAST(q_emb[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS qq,
                       sum(CAST(floor(CAST(c_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS cc
                FROM (SELECT query_id, cand_id, q_emb, c_emb,
                             unnest(generate_series(1, len(q_emb))) AS i
                      FROM pairs)
                GROUP BY query_id, cand_id
            ), scored AS (
                SELECT query_id, cand_id,
                       floor((dot / (sqrt(qq) * sqrt(cc))) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
                FROM sums
            )
            SELECT query_id, cand_id, cos_sim, rank FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cos_sim DESC, cand_id
                ) AS rank FROM scored
            ) WHERE rank <= 5
        """,
        "ann_topk_ivf": """
            WITH cent AS (
                SELECT label AS cell, pos,
                       floor((CAST(sum(CAST(floor((CAST(embedding[pos] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS c
                FROM (SELECT label, embedding,
                             unnest(generate_series(1, 64)) AS pos
                      FROM embeddings)
                GROUP BY 1, 2
            ), dist AS (
                SELECT v.vec_id, c.cell,
                       floor((sum(CAST(floor((CAST(v.embedding[c.pos] AS DOUBLE) - c.c)
                                 * (CAST(v.embedding[c.pos] AS DOUBLE) - c.c)
                                 * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS d2
                FROM embeddings v CROSS JOIN cent c
                GROUP BY 1, 2
            ), assign AS (
                SELECT vec_id, cell FROM (
                    SELECT vec_id, cell, row_number() OVER (
                        PARTITION BY vec_id ORDER BY d2, cell) AS rn
                    FROM dist)
                WHERE rn = 1
            ), pairs AS (
                SELECT qa.vec_id AS query_id, ca.vec_id AS cand_id,
                       qa.cell AS cell, q.embedding AS q_emb,
                       c2.embedding AS c_emb
                FROM assign qa
                JOIN assign ca ON qa.cell = ca.cell AND ca.vec_id <> qa.vec_id
                JOIN embeddings q ON q.vec_id = qa.vec_id
                JOIN embeddings c2 ON c2.vec_id = ca.vec_id
                WHERE qa.vec_id < 5
            ), sums AS (
                SELECT query_id, cand_id, cell,
                       sum(CAST(floor(CAST(q_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS dot,
                       sum(CAST(floor(CAST(q_emb[i] AS DOUBLE) * CAST(q_emb[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS qq,
                       sum(CAST(floor(CAST(c_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS cc
                FROM (SELECT query_id, cand_id, cell, q_emb, c_emb,
                             unnest(generate_series(1, len(q_emb))) AS i
                      FROM pairs)
                GROUP BY 1, 2, 3
            ), scored AS (
                SELECT query_id, cand_id, cell,
                       floor((dot / (sqrt(qq) * sqrt(cc))) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
                FROM sums
            )
            SELECT query_id, cand_id, cell, cos_sim, rank FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cos_sim DESC, cand_id
                ) AS rank FROM scored
            ) WHERE rank <= 5
        """,
        "ann_topk_ivf_multiprobe": """
            WITH cent AS (
                SELECT label AS cell, pos,
                       floor((CAST(sum(CAST(floor((CAST(embedding[pos] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS c
                FROM (SELECT label, embedding,
                             unnest(generate_series(1, 64)) AS pos
                      FROM embeddings)
                GROUP BY 1, 2
            ), dist AS (
                SELECT v.vec_id, c.cell,
                       floor((sum(CAST(floor((CAST(v.embedding[c.pos] AS DOUBLE) - c.c)
                                 * (CAST(v.embedding[c.pos] AS DOUBLE) - c.c)
                                 * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS d2
                FROM embeddings v CROSS JOIN cent c
                GROUP BY 1, 2
            ), assign AS (
                SELECT vec_id, cell FROM (
                    SELECT vec_id, cell, row_number() OVER (
                        PARTITION BY vec_id ORDER BY d2, cell) AS rn
                    FROM dist)
                WHERE rn = 1
            ), qprobe AS (
                -- each query probes its 2 nearest cells
                SELECT vec_id, cell FROM (
                    SELECT vec_id, cell, row_number() OVER (
                        PARTITION BY vec_id ORDER BY d2, cell) AS rn
                    FROM dist WHERE vec_id < 5)
                WHERE rn <= 2
            ), pairs AS (
                SELECT qa.vec_id AS query_id, ca.vec_id AS cand_id,
                       qa.cell AS cell, q.embedding AS q_emb,
                       c2.embedding AS c_emb
                FROM qprobe qa
                JOIN assign ca ON qa.cell = ca.cell AND ca.vec_id <> qa.vec_id
                JOIN embeddings q ON q.vec_id = qa.vec_id
                JOIN embeddings c2 ON c2.vec_id = ca.vec_id
            ), sums AS (
                SELECT query_id, cand_id, cell,
                       sum(CAST(floor(CAST(q_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS dot,
                       sum(CAST(floor(CAST(q_emb[i] AS DOUBLE) * CAST(q_emb[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS qq,
                       sum(CAST(floor(CAST(c_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS cc
                FROM (SELECT query_id, cand_id, cell, q_emb, c_emb,
                             unnest(generate_series(1, len(q_emb))) AS i
                      FROM pairs)
                GROUP BY 1, 2, 3
            ), scored AS (
                SELECT query_id, cand_id, cell,
                       floor((dot / (sqrt(qq) * sqrt(cc))) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
                FROM sums
            )
            SELECT query_id, cand_id, cell, cos_sim, rank FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cos_sim DESC, cand_id
                ) AS rank FROM scored
            ) WHERE rank <= 5
        """,
        "cluster_balanced_sample": """
            WITH cent AS (
                SELECT label AS cell, pos,
                       floor((CAST(sum(CAST(floor((CAST(embedding[pos] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS c
                FROM (SELECT label, embedding,
                             unnest(generate_series(1, 64)) AS pos
                      FROM embeddings)
                GROUP BY 1, 2
            ), dist AS (
                SELECT v.vec_id, c.cell,
                       floor((sum(CAST(floor((CAST(v.embedding[c.pos] AS DOUBLE) - c.c)
                                 * (CAST(v.embedding[c.pos] AS DOUBLE) - c.c)
                                 * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS d2
                FROM embeddings v CROSS JOIN cent c
                GROUP BY 1, 2
            ), assign AS (
                SELECT vec_id, cell FROM (
                    SELECT vec_id, cell, row_number() OVER (
                        PARTITION BY vec_id ORDER BY d2, cell) AS rn
                    FROM dist)
                WHERE rn = 1
            )
            SELECT vec_id, cell, rk FROM (
                SELECT vec_id, cell, row_number() OVER (
                    PARTITION BY cell
                    ORDER BY md5('bal:' || CAST(vec_id AS VARCHAR)), vec_id
                ) AS rk
                FROM assign
            ) WHERE rk <= 30
        """,
        "lsh_hyperplane_buckets": """
            WITH dims AS (
                SELECT vec_id, pos - 1 AS d, CAST(embedding[pos] AS DOUBLE) AS x
                FROM (SELECT vec_id, embedding,
                             unnest(generate_series(1, len(embedding))) AS pos
                      FROM embeddings)
            ), planes AS (
                SELECT p, d,
                       ((('0x' || substr(md5(p || ',' || d), 1, 8))::BIGINT % 2001) - 1000) / 1000.0 AS w
                FROM (SELECT unnest(generate_series(0, 7)) AS p),
                     (SELECT unnest(generate_series(0, 63)) AS d)
            ), proj AS (
                SELECT vec_id, p, sum(CAST(floor(x * w * 1000000.0 + 0.5) AS BIGINT)) AS proj
                FROM dims JOIN planes USING (d) GROUP BY vec_id, p
            )
            SELECT vec_id,
                   CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
            FROM proj GROUP BY vec_id
        """,
        "event_funnel": """
            WITH v AS (
                SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY 1
            ), c AS (
                SELECT e.user_id, min(e.ts) AS t2
                FROM events e JOIN v ON e.user_id = v.user_id
                WHERE e.event_type = 'click' AND e.ts > v.t1
                GROUP BY 1
            ), p AS (
                SELECT e.user_id, min(e.ts) AS t3
                FROM events e JOIN c ON e.user_id = c.user_id
                WHERE e.event_type = 'purchase' AND e.ts > c.t2
                GROUP BY 1
            ), stages AS (
                SELECT '1_view' AS stage, count(*) AS n_users FROM v
                UNION ALL
                SELECT '2_click', count(*) FROM c
                UNION ALL
                SELECT '3_purchase', count(*) FROM p
            ), top AS (SELECT count(*) AS top_n FROM v)
            SELECT stage, n_users,
                   floor((n_users / top.top_n) * 1000000.0 + 0.5)
                       / 1000000.0 AS pct_of_top
            FROM stages CROSS JOIN top
        """,
        "key_skew_report": """
            WITH c AS (
                SELECT user_id, count(*) AS cnt FROM events GROUP BY 1
            ), d AS (
                SELECT user_id, cnt,
                       CAST(length(CAST(cnt AS VARCHAR)) - 1 AS BIGINT)
                           AS decade
                FROM c
            ), m AS (
                SELECT decade, count(*) AS n_keys, max(cnt) AS max_cnt
                FROM d GROUP BY 1
            )
            SELECT m.decade, m.n_keys, m.max_cnt,
                   min(d.user_id) AS hottest_key
            FROM m JOIN d ON d.decade = m.decade AND d.cnt = m.max_cnt
            GROUP BY 1, 2, 3
        """,
        "order_grouping_sets": """
            SELECT o_orderstatus, o_orderpriority,
                   count(*) AS n,
                   floor((CAST(sum(CAST(floor((o_totalprice) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 10000.0 + 0.5) / 10000.0 AS total,
                   CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS lvl
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
        "corpus_report": """
            WITH base AS (
                SELECT lang, source,
                       CAST(len(string_split(text, ' ')) AS BIGINT)
                           AS n_tokens,
                       CAST(floor(CAST(len(list_distinct(
                                string_split(text, ' '))) AS DOUBLE)
                            / len(string_split(text, ' '))
                            * 1000000.0 + 0.5) AS BIGINT) AS ttr_micro,
                       CASE WHEN len(string_split(text, ' ')) < 8
                            THEN 1 ELSE 0 END AS is_short
                FROM documents
            )
            SELECT lang, source, count(*) AS n_docs,
                   floor((CAST(sum(n_tokens) AS BIGINT) / count(*))
                         * 1000000.0 + 0.5) / 1000000.0 AS mean_tokens,
                   floor((CAST(sum(is_short) AS BIGINT) / count(*))
                         * 1000000.0 + 0.5) / 1000000.0 AS short_doc_frac,
                   floor((CAST(sum(ttr_micro) AS BIGINT) / count(*)
                          / 1000000.0)
                         * 1000000.0 + 0.5) / 1000000.0 AS mean_ttr
            FROM base GROUP BY 1, 2
        """,
        "bow_dedup": """
            SELECT md5(array_to_string(list_sort(string_split(text, ' ')),
                                       ' ')) AS bow_fingerprint,
                   min(doc_id) AS keep_doc_id, count(*) AS n_copies
            FROM documents GROUP BY 1
        """,
        "kmeans_step": f"""
            WITH cent AS (
                SELECT label AS cell, pos,
                       floor((CAST(sum(CAST(floor((CAST(embedding[pos] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS c
                FROM (SELECT label, embedding,
                             unnest(generate_series(1, 64)) AS pos
                      FROM embeddings)
                GROUP BY 1, 2
            ), dist AS (
                SELECT v.vec_id, c.cell,
                       floor((sum(CAST(floor((CAST(v.embedding[c.pos] AS DOUBLE) - c.c)
                                 * (CAST(v.embedding[c.pos] AS DOUBLE) - c.c)
                                 * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS d2
                FROM embeddings v CROSS JOIN cent c
                GROUP BY 1, 2
            ), assign AS (
                SELECT vec_id, cell FROM (
                    SELECT vec_id, cell, row_number() OVER (
                        PARTITION BY vec_id ORDER BY d2, cell) AS rn
                    FROM dist)
                WHERE rn = 1
            ), ae AS (
                SELECT a.cell, e.embedding
                FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
            )
            SELECT cell, {centroid_cols}
            FROM ae GROUP BY cell
        """,
        "doc_repetition_scores": """
            WITH tok AS (
                SELECT doc_id, string_split(text, ' ') AS toks
                FROM documents
            ), g AS (
                SELECT doc_id, toks,
                       list_transform(generate_series(1, len(toks) - 2),
                                      i -> array_to_string(toks[i:i+2], ' ')
                       ) AS ngrams
                FROM tok WHERE len(toks) >= 3
            )
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   floor((1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
                          / len(toks)) * 1000000.0 + 0.5) / 1000000.0
                       AS dup_word_frac,
                   floor((1.0 - CAST(len(list_distinct(ngrams)) AS DOUBLE)
                          / len(ngrams)) * 1000000.0 + 0.5) / 1000000.0
                       AS dup_3gram_frac
            FROM g
        """,
        "length_bucket_stats": """
            WITH t AS (
                SELECT CAST(floor(log2(CAST(len(string_split(text, ' '))
                                 AS DOUBLE))) AS BIGINT) AS bucket,
                       CAST(len(string_split(text, ' ')) AS BIGINT)
                           AS n_tokens
                FROM documents
                WHERE len(string_split(text, ' ')) >= 1
            )
            SELECT bucket,
                   count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
                   max(n_tokens) AS max_tokens,
                   CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT)
                       AS padding_waste
            FROM t GROUP BY 1
        """,
        "semantic_dedup": """
            WITH cent AS (
                SELECT label AS cell, pos,
                       floor((CAST(sum(CAST(floor((CAST(embedding[pos] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS c
                FROM (SELECT label, embedding,
                             unnest(generate_series(1, 64)) AS pos
                      FROM embeddings)
                GROUP BY 1, 2
            ), dist AS (
                SELECT v.vec_id, c.cell,
                       floor((sum(CAST(floor((CAST(v.embedding[c.pos] AS DOUBLE) - c.c)
                                 * (CAST(v.embedding[c.pos] AS DOUBLE) - c.c)
                                 * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS d2
                FROM embeddings v CROSS JOIN cent c
                GROUP BY 1, 2
            ), assign AS (
                SELECT vec_id, cell FROM (
                    SELECT vec_id, cell, row_number() OVER (
                        PARTITION BY vec_id ORDER BY d2, cell) AS rn
                    FROM dist)
                WHERE rn = 1
            ), dims AS (
                SELECT vec_id, pos - 1 AS d, CAST(embedding[pos] AS DOUBLE) AS x
                FROM (SELECT vec_id, embedding,
                             unnest(generate_series(1, len(embedding))) AS pos
                      FROM embeddings)
            ), planes AS (
                SELECT p, d,
                       ((('0x' || substr(md5(p || ',' || d), 1, 8))::BIGINT % 2001) - 1000) / 1000.0 AS w
                FROM (SELECT unnest(generate_series(0, 7)) AS p),
                     (SELECT unnest(generate_series(0, 63)) AS d)
            ), proj AS (
                SELECT vec_id, p, sum(CAST(floor(x * w * 1000000.0 + 0.5) AS BIGINT)) AS proj
                FROM dims JOIN planes USING (d) GROUP BY vec_id, p
            ), buckets AS (
                SELECT vec_id,
                       CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
                FROM proj GROUP BY vec_id
            ), ev AS (
                SELECT e.vec_id, e.embedding, a.cell, b.bucket
                FROM embeddings e
                JOIN assign a ON e.vec_id = a.vec_id
                JOIN buckets b ON e.vec_id = b.vec_id
            ), cand AS (
                SELECT x.vec_id AS id_a, y.vec_id AS id_b,
                       x.embedding AS emb_a, y.embedding AS emb_b
                FROM ev x JOIN ev y
                  ON x.cell = y.cell AND x.bucket = y.bucket
                 AND x.vec_id < y.vec_id
            ), sums AS (
                SELECT id_a, id_b,
                       sum(CAST(floor(CAST(emb_a[i] AS DOUBLE) * CAST(emb_b[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS dot,
                       sum(CAST(floor(CAST(emb_a[i] AS DOUBLE) * CAST(emb_a[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS aa,
                       sum(CAST(floor(CAST(emb_b[i] AS DOUBLE) * CAST(emb_b[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS bb
                FROM (SELECT id_a, id_b, emb_a, emb_b,
                             unnest(generate_series(1, len(emb_a))) AS i
                      FROM cand)
                GROUP BY id_a, id_b
            ), close AS (
                SELECT id_a, id_b,
                       floor((dot / (sqrt(aa) * sqrt(bb))) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
                FROM sums
                WHERE floor((dot / (sqrt(aa) * sqrt(bb))) * 1000000.0 + 0.5) / 1000000.0 >= 0.2
            )
            SELECT id_b AS vec_id, min(id_a) AS keeper_id,
                   arg_min(cos_sim, id_a) AS cos_sim
            FROM close GROUP BY 1
        """,
        "embedding_neardup_pairs": """
            WITH dims AS (
                SELECT vec_id, pos - 1 AS d, CAST(embedding[pos] AS DOUBLE) AS x
                FROM (SELECT vec_id, embedding,
                             unnest(generate_series(1, len(embedding))) AS pos
                      FROM embeddings)
            ), planes AS (
                SELECT p, d,
                       ((('0x' || substr(md5(p || ',' || d), 1, 8))::BIGINT % 2001) - 1000) / 1000.0 AS w
                FROM (SELECT unnest(generate_series(0, 7)) AS p),
                     (SELECT unnest(generate_series(0, 63)) AS d)
            ), proj AS (
                SELECT vec_id, p, sum(CAST(floor(x * w * 1000000.0 + 0.5) AS BIGINT)) AS proj
                FROM dims JOIN planes USING (d) GROUP BY vec_id, p
            ), buckets AS (
                SELECT vec_id,
                       CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
                FROM proj GROUP BY vec_id
            ), ev AS (
                SELECT e.vec_id, e.embedding, b.bucket
                FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
            ), cand AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       a.embedding AS emb_a, b.embedding AS emb_b
                FROM ev a JOIN ev b
                  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            ), sums AS (
                SELECT id_a, id_b,
                       sum(CAST(floor(CAST(emb_a[i] AS DOUBLE) * CAST(emb_b[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS dot,
                       sum(CAST(floor(CAST(emb_a[i] AS DOUBLE) * CAST(emb_a[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS aa,
                       sum(CAST(floor(CAST(emb_b[i] AS DOUBLE) * CAST(emb_b[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS bb
                FROM (SELECT id_a, id_b, emb_a, emb_b,
                             unnest(generate_series(1, len(emb_a))) AS i
                      FROM cand)
                GROUP BY id_a, id_b
            )
            SELECT id_a, id_b,
                   floor((dot / (sqrt(aa) * sqrt(bb))) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
            FROM sums
            WHERE floor((dot / (sqrt(aa) * sqrt(bb))) * 1000000.0 + 0.5) / 1000000.0 >= 0.4
        """,
        "streaming_hourly_rollup": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n, floor((CAST(sum(CAST(floor((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS total_value
            FROM events GROUP BY 1, 2
        """,
        "streaming_sliding_counts": """
            SELECT w_start, count(*) AS n, floor((CAST(sum(CAST(floor((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS total_value
            FROM (
                SELECT unnest([date_trunc('hour', ts),
                               date_trunc('hour', ts) - INTERVAL '1 hour']) AS w_start,
                       value
                FROM events
            ) GROUP BY w_start
        """,
        "streaming_attribution": """
            SELECT p.event_id AS purchase_id, p.user_id, c.ts AS c_ts
            FROM events p JOIN events c
              ON p.user_id = c.user_id
             AND p.event_type = 'purchase' AND c.event_type = 'click'
             AND c.ts >= p.ts - INTERVAL '1 hour' AND c.ts < p.ts
        """,
        "streaming_enriched_rollup": """
            SELECT c_mktsegment, count(*) AS n_events,
                   floor((CAST(sum(CAST(floor((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS total_value
            FROM events JOIN customer ON user_id = c_custkey
            GROUP BY c_mktsegment
        """,
        "streaming_dedup": """
            SELECT DISTINCT user_id, event_type FROM events
        """,
        "streaming_attribution_full_outer": """
            WITH p AS (
                SELECT event_id AS purchase_id, user_id AS p_user,
                       ts AS p_ts
                FROM events WHERE event_type = 'purchase'
            ), c AS (
                SELECT event_id AS click_id, user_id AS c_user, ts AS c_ts
                FROM events WHERE event_type = 'click'
            ), m AS (
                SELECT p.purchase_id, p.p_user, p.p_ts,
                       c.click_id, c.c_user, c.c_ts
                FROM p JOIN c ON p.p_user = c.c_user
                 AND c.c_ts >= p.p_ts - INTERVAL '1 hour'
                 AND c.c_ts < p.p_ts
            ), mx AS (
                SELECT least(max(CASE WHEN event_type = 'purchase' THEN ts END),
                             max(CASE WHEN event_type = 'click' THEN ts END))
                       AS mt
                FROM events
            )
            SELECT purchase_id, p_user, p_ts, click_id, c_user, c_ts FROM m
            UNION ALL
            SELECT p.purchase_id, p.p_user, p.p_ts,
                   CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
                   CAST(NULL AS TIMESTAMP)
            FROM p CROSS JOIN mx
            WHERE p.p_ts <= mx.mt - INTERVAL '3 hours'
              AND NOT EXISTS (
                  SELECT 1 FROM m WHERE m.purchase_id = p.purchase_id)
            UNION ALL
            SELECT CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
                   CAST(NULL AS TIMESTAMP),
                   c.click_id, c.c_user, c.c_ts
            FROM c CROSS JOIN mx
            WHERE c.c_ts <= mx.mt - INTERVAL '4 hours'
              AND NOT EXISTS (
                  SELECT 1 FROM m WHERE m.click_id = c.click_id)
        """,
        "streaming_attribution_outer": """
            WITH p AS (
                SELECT event_id AS purchase_id, user_id, ts AS p_ts
                FROM events WHERE event_type = 'purchase'
            ), c AS (
                SELECT user_id AS c_user, ts AS c_ts
                FROM events WHERE event_type = 'click'
            ), m AS (
                SELECT p.purchase_id, p.user_id, p.p_ts, c.c_ts
                FROM p JOIN c ON p.user_id = c.c_user
                 AND c.c_ts >= p.p_ts - INTERVAL '1 hour'
                 AND c.c_ts < p.p_ts
            ), mx AS (
                -- engine watermark = min over the two watermark operators,
                -- each on its own filtered stream; -3h = 2h delay + 1h
                -- safety margin inside the eviction boundary
                SELECT least(max(CASE WHEN event_type = 'purchase' THEN ts END),
                             max(CASE WHEN event_type = 'click' THEN ts END))
                       AS mt
                FROM events
            )
            SELECT purchase_id, user_id, p_ts, c_ts FROM m
            UNION ALL
            SELECT p.purchase_id, p.user_id, p.p_ts,
                   CAST(NULL AS TIMESTAMP) AS c_ts
            FROM p CROSS JOIN mx
            WHERE p.p_ts <= mx.mt - INTERVAL '3 hours'
              AND NOT EXISTS (
                  SELECT 1 FROM m WHERE m.purchase_id = p.purchase_id)
        """,
        "streaming_upsert_sink": """
            SELECT user_id, event_type, ts, value, event_id FROM (
                SELECT user_id, event_type, ts, value, event_id,
                       row_number() OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "token_counts": """
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+')) AS n_pieces,
                   len(list_distinct(string_split(text, ' '))) AS n_types,
                   floor((length(text) * 1.0 / len(string_split(text, ' '))) * 1000000.0 + 0.5) / 1000000.0 AS chars_per_token
            FROM documents
        """,
        "lang_id_heuristic": """
            WITH scores AS (
                SELECT doc_id,
                       CAST(sum(CASE WHEN word IN ('der','die','das','und','ist') THEN 1 ELSE 0 END) AS BIGINT) AS score_de,
                       CAST(sum(CASE WHEN word IN ('the','a','is','what','it','and') THEN 1 ELSE 0 END) AS BIGINT) AS score_en,
                       CAST(sum(CASE WHEN word IN ('el','la','los','es','y') THEN 1 ELSE 0 END) AS BIGINT) AS score_es,
                       CAST(sum(CASE WHEN word IN ('le','la','les','est','et') THEN 1 ELSE 0 END) AS BIGINT) AS score_fr,
                       CAST(sum(CASE WHEN word IN ('的','是','了','在') THEN 1 ELSE 0 END) AS BIGINT) AS score_zh
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                      FROM documents)
                GROUP BY doc_id
            )
            SELECT doc_id,
                   CASE WHEN score_de = m THEN 'de'
                        WHEN score_en = m THEN 'en'
                        WHEN score_es = m THEN 'es'
                        WHEN score_fr = m THEN 'fr'
                        ELSE 'zh' END AS pred_lang,
                   m AS best_score
            FROM (SELECT *, greatest(score_de, score_en, score_es, score_fr, score_zh) AS m
                  FROM scores)
        """,
        "doc_quality_scores": """
            WITH tok AS (
                SELECT doc_id,
                       count(*) AS n_tokens,
                       floor((CAST(sum(length(word)) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_word_len,
                       floor((CAST(sum(CASE WHEN word IN ('the','a','is','what','it','and','of','to','in')
                                      THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS stopword_ratio,
                       floor((count(DISTINCT word) * 1.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS distinct_ratio
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                      FROM documents)
                GROUP BY doc_id
            )
            SELECT d.doc_id, length(d.text) AS n_chars_text,
                   t.n_tokens, t.avg_word_len, t.stopword_ratio, t.distinct_ratio,
                   floor((least(t.n_tokens / 100.0, 1.0) * 0.4
                         + t.distinct_ratio * 0.4
                         + (1 - t.stopword_ratio) * 0.2) * 1000000.0 + 0.5) / 1000000.0 AS quality_score
            FROM documents d JOIN tok t ON d.doc_id = t.doc_id
        """,
        "doc_fingerprints": """
            SELECT doc_id,
                   md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
                   length(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS norm_len
            FROM documents
        """,
        "vocab_coverage": """
            WITH wn AS (
                SELECT word FROM (
                    SELECT unnest(string_split(text, ' ')) AS word
                    FROM documents)
                WHERE word <> ''
            ), topk AS (
                SELECT word FROM (
                    SELECT word, count(*) AS c FROM wn GROUP BY 1
                    ORDER BY c DESC, word LIMIT 20)
            )
            SELECT count(*) AS n_tokens,
                   CAST(sum(CASE WHEN word IN (SELECT word FROM topk)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
                   floor((sum(CASE WHEN word IN (SELECT word FROM topk)
                                  THEN 1 ELSE 0 END) * 1.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0
                       AS coverage
            FROM wn
        """,
        "stratified_sample": """
            SELECT doc_id, lang, source, bucket FROM (
                SELECT doc_id, lang, source,
                       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
                FROM documents)
            WHERE bucket < (CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 30
                            ELSE 20 END)
        """,
        "dataset_splits": """
            SELECT split, lang, count(*) AS n_docs FROM (
                SELECT lang,
                       CASE WHEN b < 80 THEN 'train'
                            WHEN b < 90 THEN 'val'
                            ELSE 'test' END AS split
                FROM (SELECT lang,
                             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
                      FROM documents))
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "rolling_fingerprints": """
            WITH pos AS (
                SELECT doc_id, text,
                       unnest(generate_series(1, length(text) - 15)) AS p
                FROM documents WHERE length(text) >= 16
            ), h AS (
                SELECT doc_id, CAST((p - 1) // 8 AS BIGINT) AS block,
                       ('0x' || substr(md5(substring(text, p, 16)), 1, 8))::BIGINT AS hv
                FROM pos
            )
            SELECT doc_id, block, min(hv) AS fp
            FROM h GROUP BY 1, 2
        """,
        "term_freq": """
            SELECT word, doc_id, count(*) AS tf FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
            ) WHERE word <> '' GROUP BY word, doc_id
        """,
        "positional_postings": """
            SELECT t[pos] AS word, doc_id, CAST(pos AS BIGINT) AS pos
            FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS pos
                  FROM (SELECT doc_id, string_split(text, ' ') AS t
                        FROM documents))
            WHERE t[pos] <> ''
        """,
        "phrase_search": """
            WITH t AS (
                SELECT doc_id, pos, t[pos] AS word
                FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS pos
                      FROM (SELECT doc_id, string_split(text, ' ') AS t
                            FROM documents))
            )
            SELECT a.doc_id, count(*) AS n_hits
            FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
            WHERE a.word = 'table' AND b.word = 'hash'
            GROUP BY 1
        """,
        "inverted_index_str": """
            SELECT word,
                   array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS doc_ids,
                   count(DISTINCT doc_id) AS df
            FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
            ) WHERE word <> '' GROUP BY word
        """,
        "posting_list_tf_str": """
            SELECT word,
                   string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id, tf) AS postings,
                   CAST(sum(tf) AS BIGINT) AS total_tf
            FROM (
                SELECT word, doc_id, count(*) AS tf FROM (
                    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
                ) WHERE word <> '' GROUP BY word, doc_id
            ) GROUP BY word
        """,
        "word_counts": """
            SELECT word, count(*) AS cnt FROM (
                SELECT unnest(string_split(text, ' ')) AS word FROM documents
            ) WHERE word <> '' GROUP BY word
        """,
        "salted_top_words": """
            SELECT word, count(*) AS cnt FROM (
                SELECT unnest(string_split(text, ' ')) AS word FROM documents
            ) WHERE word <> '' GROUP BY word
        """,
        "chunk_documents": """
            WITH t AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), c AS (
                SELECT doc_id, toks,
                       unnest(generate_series(0, (len(toks) - 1) // 32)) AS chunk_id
                FROM t
            )
            SELECT doc_id,
                   CAST(chunk_id AS BIGINT) AS chunk_id,
                   array_to_string(
                       toks[chunk_id * 32 + 1 : least((chunk_id + 1) * 32, len(toks))],
                       ' ') AS chunk_text,
                   CAST(least((chunk_id + 1) * 32, len(toks)) - chunk_id * 32
                        AS BIGINT) AS n_tokens
            FROM c
        """,
        "packed_sequences": """
            WITH t AS (
                SELECT doc_id, source,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n
                FROM documents
            ), c AS (
                SELECT doc_id, source, n,
                       sum(n) OVER (
                           PARTITION BY source ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS cum
                FROM t
            )
            SELECT doc_id, source, n AS n_tokens,
                   CAST((cum - n) // 256 AS BIGINT) AS bin_id,
                   CAST((cum - n) % 256 AS BIGINT) AS offset_in_bin
            FROM c
        """,
        "benchmark_contamination": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks) - 2)) AS pos
                      FROM toks)
            ), ev AS (
                SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
            )
            SELECT doc_id, count(*) AS n_shared_shingles
            FROM sh JOIN ev USING (shingle)
            WHERE doc_id % 97 <> 0
            GROUP BY doc_id
        """,
        "embedding_quantize_int8": """
            WITH d AS (
                SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
                FROM (SELECT vec_id, embedding,
                             unnest(generate_series(1, len(embedding))) AS i
                      FROM embeddings)
            ), m AS (
                SELECT vec_id, max(abs(x)) AS m FROM d GROUP BY vec_id
            )
            SELECT d.vec_id,
                   floor((m.m / 127.0) * 1000000.0 + 0.5) / 1000000.0 AS qscale,
                   string_agg(
                       CAST(CAST(CASE WHEN m.m = 0.0 THEN 0.0
                                      ELSE floor(x * 127.0 / m.m + 0.5)
                                 END AS BIGINT) AS VARCHAR),
                       ',' ORDER BY i) AS q_str
            FROM d JOIN m USING (vec_id)
            GROUP BY d.vec_id, m.m
        """,
    }
    # the streaming stateful sessionizer emits the exact batch schema
    oracles["streaming_sessionization"] = oracles["sessionize"]
    # native streaming session_window in complete mode == batch gap-merge
    oracles["streaming_session_windows"] = oracles["session_window_rollup"]
    # the cogroup-pandas as-of twin shares the native as-of oracle
    oracles["asof_last_click_cogroup"] = oracles["asof_last_click"]
    # arrow-optimized scalar UDF norms: 4th twin of the one norm oracle
    oracles["embedding_norms_arrow_udf"] = oracles["embedding_norms_pandas"]
    # VARIANT twin of the JSON-path extraction, plus the try-path count
    # (always-present $.k, never-present $.missing)
    oracles["json_props_variant"] = """
        SELECT event_type,
               sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                   AS sum_k,
               min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                   AS min_k,
               max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                   AS max_k,
               count(*) AS n,
               CAST(count(CASE WHEN json_extract_string(props, '$.missing')
                               IS NOT NULL THEN 1 END) AS BIGINT)
                   AS n_missing_present
        FROM events GROUP BY event_type
    """
    # representative pick = the pagerank oracle's CTE chain, made
    # RECURSIVE, extended with the connected-components walk and a
    # per-cluster ranking window — composed by string surgery so the
    # two sub-oracles can never drift apart
    _pr = oracles["neardup_pagerank"]
    assert _pr.lstrip().startswith("WITH toks AS")
    _final = "SELECT doc_id, pr AS pagerank FROM r5"
    assert _final in _pr
    oracles["dedup_cluster_representatives"] = _pr.replace(
        "WITH toks AS", "WITH RECURSIVE toks AS", 1
    ).replace(
        _final,
        """, walk(doc, reach) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT w.doc, b2.d FROM walk w JOIN bidir b2 ON w.reach = b2.s
            ), cc AS (
                SELECT doc AS doc_id, min(reach) AS cluster_id
                FROM walk GROUP BY doc
            ), joined AS (
                SELECT cc.cluster_id, r5.doc_id, r5.pr
                FROM cc JOIN r5 USING (doc_id)
            )
            SELECT cluster_id, doc_id AS rep_doc_id, pr AS rep_pagerank,
                   n_members
            FROM (
                SELECT cluster_id, doc_id, pr,
                       count(*) OVER (PARTITION BY cluster_id) AS n_members,
                       row_number() OVER (
                           PARTITION BY cluster_id ORDER BY pr DESC, doc_id
                       ) AS rn
                FROM joined)
            WHERE rn = 1""",
    )
    oracles["contrastive_negatives"] = """
            WITH ranked AS (
                SELECT doc_id,
                       row_number() OVER (ORDER BY doc_id) - 1 AS rnk
                FROM documents
            ), n AS (SELECT count(*) AS n_docs FROM documents),
            fan AS (
                SELECT r.doc_id, r.rnk, i.neg_i
                FROM ranked r,
                     (SELECT unnest(generate_series(0, 3)) AS neg_i) i
            ), picked AS (
                SELECT doc_id, neg_i,
                       CASE WHEN h = rnk THEN (h + 1) % n.n_docs ELSE h END
                           AS neg_rnk
                FROM (
                    SELECT f.doc_id, f.rnk, f.neg_i,
                           ('0x' || substr(md5(CAST(f.doc_id AS VARCHAR)
                                || ':' || CAST(f.neg_i AS VARCHAR)), 1, 8)
                           )::BIGINT % n.n_docs AS h,
                           n.n_docs
                    FROM fan f CROSS JOIN n
                ) CROSS JOIN n
            )
            SELECT p.doc_id, p.neg_i, r.doc_id AS neg_doc_id
            FROM picked p JOIN ranked r ON p.neg_rnk = r.rnk
        """
    oracles["semantic_dedup_multiprobe"] = """
            WITH cent AS (
                SELECT label AS cell, pos,
                       floor((CAST(sum(CAST(floor((CAST(embedding[pos] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS c
                FROM (SELECT label, embedding,
                             unnest(generate_series(1, 64)) AS pos
                      FROM embeddings)
                GROUP BY 1, 2
            ), dist AS (
                SELECT v.vec_id, c.cell,
                       floor((sum(CAST(floor((CAST(v.embedding[c.pos] AS DOUBLE) - c.c)
                                 * (CAST(v.embedding[c.pos] AS DOUBLE) - c.c)
                                 * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS d2
                FROM embeddings v CROSS JOIN cent c
                GROUP BY 1, 2
            ), ranked AS (
                SELECT vec_id, cell, row_number() OVER (
                    PARTITION BY vec_id ORDER BY d2, cell) AS rn
                FROM dist
            ), dims AS (
                SELECT vec_id, pos - 1 AS d, CAST(embedding[pos] AS DOUBLE) AS x
                FROM (SELECT vec_id, embedding,
                             unnest(generate_series(1, len(embedding))) AS pos
                      FROM embeddings)
            ), planes AS (
                SELECT p, d,
                       ((('0x' || substr(md5(p || ',' || d), 1, 8))::BIGINT % 2001) - 1000) / 1000.0 AS w
                FROM (SELECT unnest(generate_series(0, 7)) AS p),
                     (SELECT unnest(generate_series(0, 63)) AS d)
            ), proj AS (
                SELECT vec_id, p, sum(CAST(floor(x * w * 1000000.0 + 0.5) AS BIGINT)) AS proj
                FROM dims JOIN planes USING (d) GROUP BY vec_id, p
            ), buckets AS (
                SELECT vec_id,
                       CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
                FROM proj GROUP BY vec_id
            ), ev AS (
                SELECT r.vec_id, r.cell, b.bucket
                FROM ranked r JOIN buckets b USING (vec_id)
                WHERE r.rn = 1
            ), pv AS (
                SELECT r.vec_id, r.cell, b.bucket
                FROM ranked r JOIN buckets b USING (vec_id)
                WHERE r.rn <= 2
            ), cand AS (
                SELECT x.vec_id AS id_a, y.vec_id AS id_b
                FROM pv x JOIN ev y
                  ON x.cell = y.cell AND x.bucket = y.bucket
                 AND x.vec_id < y.vec_id
                UNION
                SELECT x.vec_id AS id_a, y.vec_id AS id_b
                FROM ev x JOIN pv y
                  ON x.cell = y.cell AND x.bucket = y.bucket
                 AND x.vec_id < y.vec_id
            ), sums AS (
                SELECT id_a, id_b,
                       sum(CAST(floor(CAST(emb_a[i] AS DOUBLE) * CAST(emb_b[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS dot,
                       sum(CAST(floor(CAST(emb_a[i] AS DOUBLE) * CAST(emb_a[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS aa,
                       sum(CAST(floor(CAST(emb_b[i] AS DOUBLE) * CAST(emb_b[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS bb
                FROM (SELECT c.id_a, c.id_b,
                             p.embedding AS emb_a, q.embedding AS emb_b,
                             unnest(generate_series(1, len(p.embedding))) AS i
                      FROM cand c
                      JOIN embeddings p ON p.vec_id = c.id_a
                      JOIN embeddings q ON q.vec_id = c.id_b)
                GROUP BY id_a, id_b
            ), close AS (
                SELECT id_a, id_b,
                       floor((dot / (sqrt(aa) * sqrt(bb))) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
                FROM sums
                WHERE floor((dot / (sqrt(aa) * sqrt(bb))) * 1000000.0 + 0.5) / 1000000.0 >= 0.2
            )
            SELECT id_b AS vec_id, min(id_a) AS keeper_id,
                   arg_min(cos_sim, id_a) AS cos_sim
            FROM close GROUP BY 1
        """
    return oracles
