"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps each
implemented operator (SURVEY.md §2 + extensions) to a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` gives the DuckDB
twin for the driver's differential correctness check.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from geektime_bigdata_spark import streaming
from geektime_bigdata_spark.sources import binfiles, columnar, pyds, textio
from geektime_bigdata_spark.operators import (
    dedup,
    etl,
    joins,
    multimodal,
    pipeline,
    relational,
    scale,
    similarity,
    sketches,
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

    ORDERING CONTRACT: the driver sweeps a 50-slot prefix.  With the
    registry at 211 (the multi-suite contamination report, the
    tie-grouped Zipf-slope scale tier, the per-source BPE compression
    report, the split-leakage report, and the decontamination scrub
    added r17) and
    every prior entry ever driver-green, the
    prefix is a pure freshness rotation: each round re-checks the
    oldest cohort in the correctness ledger (latest green round per
    query, recomputed from the CORRECTNESS_r* union before rotating).
    The current prescription lives in the comment block on
    `_SWEEP_PRIORITY` below; everything outside the prefix keeps its
    prior relative order, so a prefix of any length always maximizes
    stale-coverage refresh."""
    base = {
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
        # round-5 second tier: the PPJoin length filter moved into the
        # equi-join key (exact power-of-2 size bands) — bit-equal output
        # through the shared oracle; registered past the 50-slot prefix
        # (this round's prefix is the prescribed freshness rotation),
        # heads the round-6 queue
        "prefix_filter_jaccard_pairs_banded": (
            dedup.prefix_filter_jaccard_pairs_banded
        ),
        # round-5: PII redaction with canary-injection verification
        # (C4/Dolma-style scrub stage; RE2∩Java-identical regex subset);
        # past-prefix, r6 queue with the banded tier
        "pii_canary_scrub": textstats.pii_canary_scrub,
        # round-5: JSONL source/sink end-to-end (the LLM-corpus
        # interchange format) with a text-integrity checksum
        "jsonl_roundtrip_stats": textio.jsonl_roundtrip_stats,
        # round-13: ORC source/sink end-to-end — the Hive-default
        # columnar layout of the reference's Hadoop stack, carrying the
        # types JSONL cannot (TIMESTAMP micros, DOUBLE); heads the r13
        # sweep prefix so it gets its driver row the round it shipped
        "orc_roundtrip_stats": columnar.orc_roundtrip_stats,
        # round-14: CSV source/sink end-to-end — text interchange made
        # lossless by explicit option discipline (microsecond
        # timestampFormat, shortest-repr doubles); same straight-off-
        # parquet oracle as ORC (_ORACLE_TWINS) — two formats, one truth
        "csv_roundtrip_stats": textio.csv_roundtrip_stats,
        # round-14: XML source/sink end-to-end — built into Spark 4
        # (spark-xml merged upstream; zero installs), same shared
        # aggregate + straight-off-parquet oracle as ORC/CSV
        "xml_roundtrip_stats": textio.xml_roundtrip_stats,
        # round-14: binary-file export -> binaryFile ingest loop (the
        # media-shard filesystem boundary the in-engine codecs never
        # crossed); oracle rebuilds the payloads straight off documents
        "binary_ingest_digests": binfiles.binary_ingest_digests,
        # round-6: REAL audio codec path — RIFF/WAVE PCM16 encode+decode
        # via the stdlib `wave` module (closes the audio third of the
        # multimodal codec debt with zero installs); heads the r6 sweep
        # prefix so it gets its driver row the round it shipped
        "wav_roundtrip_features": multimodal.wav_roundtrip_features,
        # round-6: REAL image codec path — spec-conformant baseline PNG
        # encode+decode over stdlib zlib/struct (closes the image third
        # of the codec debt); registered past the prefix, r7 queue
        "png_roundtrip_features": multimodal.png_roundtrip_features,
        # round-6: REAL video container path — uncompressed RIFF/AVI
        # write+parse over stdlib struct (bottom-up padded BGR DIB
        # frames); only compressed-bitstream decode stays stubbed
        "avi_roundtrip_features": multimodal.avi_roundtrip_features,
        # winsorized stats + drift histogram (feature-prep profiling)
        "clipped_value_stats": etl.clipped_value_stats,
        "value_histogram": etl.value_histogram,
        # mixture planning: budget allocation + truncation audit
        "mixture_allocation": textstats.mixture_allocation,
        "truncation_report": textstats.truncation_report,
        # sketch family driver row: exact values + bound-held booleans
        # (HLL++, percentile_approx rank error, Misra-Gries survival)
        "sketch_error_bounds": sketches.sketch_error_bounds,
        # batched BPE: k symbol-disjoint merges per corpus pass — the
        # pass-count reduction a 10k-merge tokenizer build needs
        "bpe_train_merges_batched": textstats.bpe_train_merges_batched,
        # substring-level near-dup pairs from the winnowing fingerprints
        "winnow_neardup_pairs": textstats.winnow_neardup_pairs,
        # character-level near-dups: blocked Levenshtein record linkage
        "edit_distance_pairs": dedup.edit_distance_pairs,
        # second blocking key: sorted-neighborhood (suffix-anchored)
        "edit_distance_pairs_snm": dedup.edit_distance_pairs_snm,
        # BPE inference: apply the learned merges, fingerprint streams
        "bpe_encode_corpus": textstats.bpe_encode_corpus,
        # per-source compression of the learned merges (tokenizer
        # fairness); registered past the r17 prefix, heads the r18 queue
        "bpe_compression_by_source": textstats.bpe_compression_by_source,
        # quality-classifier training: 2 logistic-regression GD steps
        "quality_logreg_step": textstats.quality_logreg_step,
        # CCNet-shape bigram LM scoring (conditional log-probs)
        "bigram_logprob_scores": textstats.bigram_logprob_scores,
        # originality: fraction of shingles unique to the document
        "ngram_novelty_scores": dedup.ngram_novelty_scores,
        # capstone: cross-detector overlap matrix (5 pair families)
        "neardup_detector_matrix": dedup.neardup_detector_matrix,
        # simhash family doc-level expansion (value pairs -> doc pairs)
        "simhash_doc_pairs": dedup.simhash_doc_pairs,
        # top principal direction via power iteration on the Gram matrix
        "embedding_pca_power": similarity.embedding_pca_power,
        # top-2 directions: power iteration + Hotelling deflation
        "embedding_pca_top2": similarity.embedding_pca_top2,
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
        "bm25_topk_docs": text.bm25_topk_docs,
        "broadcast_dim_join": joins.broadcast_dim_join,
        # ---- (4b) driver-green in rounds 1-2, surface unchanged ----
        "doc_repetition_scores": textstats.doc_repetition_scores,
        "length_bucket_stats": textstats.length_bucket_stats,
        "semantic_dedup": similarity.semantic_dedup,
        "kmeans_step": similarity.kmeans_step,
        "cluster_silhouette": similarity.cluster_silhouette,
        "bow_dedup": dedup.bow_dedup,
        "order_grouping_sets": relational.order_grouping_sets,
        "corpus_report": textstats.corpus_report,
        "key_skew_report": scale.key_skew_report,
        "compact_small_files": scale.compact_small_files,
        # round-6: the ZORDER half of lakehouse OPTIMIZE — Morton-curve
        # vs lexicographic layout scored by zone-map data skipping;
        # registered past the 50-slot prefix, heads the r7 queue
        "zorder_layout_skipping": scale.zorder_layout_skipping,
        "event_funnel": windows.event_funnel,
        # --- dedup suite (training-data pipeline) ---
        "exact_dedup": dedup.exact_dedup,
        "minhash_signatures": dedup.minhash_signatures,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "simhash_fingerprints": dedup.simhash_fingerprints,
        "simhash_neardup_pairs": dedup.simhash_neardup_pairs,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "ngram_jaccard_pairs_dfcapped": dedup.ngram_jaccard_pairs_dfcapped,
        "minhash_jaccard_estimate": dedup.minhash_jaccard_estimate,
        "neardup_pagerank": dedup.neardup_pagerank,
        "dedup_clusters": dedup.dedup_clusters,
        "benchmark_contamination": dedup.benchmark_contamination,
        "contamination_retrieval": dedup.contamination_retrieval,
        "contamination_suite_report": dedup.contamination_suite_report,
        # the scrub step of the contamination family (per-train-doc
        # keep flags); registered past the r17 prefix, r18 queue
        "decontaminate_corpus": dedup.decontaminate_corpus,
        "duplicate_span_stats": dedup.duplicate_span_stats,
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
        "source_fair_quality_rank": textstats.source_fair_quality_rank,
        "source_fair_quality_caps": textstats.source_fair_quality_caps,
        "source_zipf_slope": textstats.source_zipf_slope,
        "source_zipf_slope_grouped": textstats.source_zipf_slope_grouped,
        "doc_fingerprints": textstats.doc_fingerprints,
        "rolling_fingerprints": textstats.rolling_fingerprints,
        "stratified_sample": textstats.stratified_sample,
        "vocab_coverage": textstats.vocab_coverage,
        "dataset_splits": textstats.dataset_splits,
        # exact-content leakage across split boundaries (eval
        # integrity); registered past the r17 prefix, r18 queue
        "split_leakage_report": textstats.split_leakage_report,
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
    ordered = {k: base[k] for k in _SWEEP_PRIORITY}
    ordered.update((k, v) for k, v in base.items() if k not in ordered)
    return ordered


# Round-18 sweep prefix (driver checks the first 50 queries() entries).
# Round 18 is the second OPTIMIZATION round. Per the ordering contract
# the changed surface leads: (1) the 32 queries whose code path changed
# THIS round — the Arrow-vectorized IVF index family (7), the shared
# Arrow token-tf family (7), the Arrow/adaptive-spread BPE family (5),
# the step-by-2 reach recursion (1), the fan-tightened pyds roundtrips
# (2), and all ten streaming runners (input-sized state partitions) —
# then (2) one rider per shared rewritten/persist-retagged helper kept
# in-prefix per ADVICE r17 item 4 (minhash_lsh_pairs for the
# shingle/doc-shingle caches, ngram_jaccard_pairs for the graph-edge
# cache, boilerplate_ngrams for _shingle_df, embedding_gram_matrix for
# the similarity-file memo seam), then (3) the r17-displaced stale
# cohort (staleness r12, 6 rounds) filling the remaining 14 slots
# exactly. Everything else keeps its prior relative order; the
# round-close `sweep_check --all` covers the full 211 at sf0.01.
_SWEEP_PRIORITY = [
    # (1) changed this round — IVF/Arrow index family
    "semantic_dedup_multiprobe",
    "ann_topk_ivf_multiprobe",
    "ann_topk_ivf",
    "semantic_dedup",
    "cluster_silhouette",
    "cluster_balanced_sample",
    "kmeans_step",
    # (1) changed — shared Arrow token-tf family
    "word_counts",
    "term_freq",
    "inverted_index_str",
    "posting_list_tf_str",
    "tfidf_top_terms",
    "bm25_top_terms",
    "bm25_topk_docs",
    # (1) changed — Arrow pair partials + adaptive spread + collected
    # top-k BPE family
    "bpe_pair_counts",
    "bpe_train_merges",
    "bpe_train_merges_batched",
    "bpe_encode_corpus",
    "bpe_compression_by_source",
    # (1) changed — step-by-2 recursion / driver DP gate
    "neardup_reach_rcte",
    # (1) changed — pyds source fan
    "pyds_tsv_roundtrip",
    "pyds_stream_roundtrip",
    # (1) changed — streaming runners (sized state partitions)
    "streaming_hourly_rollup",
    "streaming_sliding_counts",
    "streaming_enriched_rollup",
    "streaming_attribution",
    "streaming_attribution_outer",
    "streaming_attribution_full_outer",
    "streaming_dedup",
    "streaming_upsert_sink",
    "streaming_session_windows",
    "streaming_sessionization",
    # (2) one rider per shared rewritten/retagged helper (ADVICE r17)
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "boilerplate_ngrams",
    "embedding_gram_matrix",
    # (3) the r17-displaced stale cohort (r12-latest), 14 slots
    "walk_skipgram_pairs",
    "media_features",
    "media_features_wide",
    "media_type_stats",
    "incoming_batch_dedup",
    "per_source_caps",
    "png_roundtrip_features",
    "quality_weighted_sample",
    "sliding_wau",
    "sliding_window_counts",
    "user_path_trigrams",
    "user_value_trend",
    "vocab_coverage",
    "zorder_layout_skipping",
]


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins; column names/aliases match queries().

    The SQL bodies live in ``oracles/<name>.sql`` next to this file
    (one file per canonical oracle, loaded by name) so the driver
    contract file stays reviewable; ``_ORACLE_TWINS`` maps the queries
    whose oracle is byte-identical to a sibling's (a pandas/arrow/
    streaming twin proving the same semantics through a different
    execution tier) onto the one shared file.

    Two structural guards keep this registry sound
    (tests/test_oracle_types.py): every oracle must bind in DuckDB
    with only driver-safe output types (no HUGEINT/DECIMAL — DuckDB
    widens sum(BIGINT) to HUGEINT, which the driver's fetch path
    renders unlike Spark's LongType even when values are identical),
    and every oracle key must have a queries() entry.

    Float contract rule: every hashed column derived from a
    nondeterministically-ordered double sum accumulates through LONG
    micro-units on BOTH engines (``CAST(sum(CAST(floor(x * 1000000.0 +
    0.5) AS BIGINT)) AS BIGINT)`` here,
    :func:`geektime_bigdata_spark.functions.exact_sum` in the Spark
    plan) — the quantization is identical IEEE double arithmetic in
    every engine and integer addition is associative, so partitioning
    can never flip a round(,N) boundary (round 1's only driver FAIL).
    The outer BIGINT cast is load-bearing (round 3's ONLY driver-fail
    class): without it DuckDB widens the sum to HUGEINT.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    oracles: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(here, "oracles", "*.sql"))):
        name = os.path.splitext(os.path.basename(path))[0]
        with open(path, "r", encoding="utf-8") as fh:
            oracles[name] = fh.read()
    for twin, canonical in _ORACLE_TWINS.items():
        oracles[twin] = oracles[canonical]
    return oracles


# queries whose oracle is byte-identical to a sibling's: the same SQL
# contract proven through a second execution tier (pandas vs arrow UDF,
# batch vs streaming, salted vs plain aggregation)
_ORACLE_TWINS = {
    "embedding_norms_arrow": "embedding_norms_pandas",
    "embedding_norms_arrow_udf": "embedding_norms_pandas",
    "streaming_hourly_rollup": "hourly_event_rollup",
    "streaming_sliding_counts": "sliding_window_counts",
    "streaming_sessionization": "sessionize",
    "streaming_session_windows": "session_window_rollup",
    "salted_top_words": "word_counts",
    "asof_last_click_cogroup": "asof_last_click",
    "prefix_filter_jaccard_pairs_banded": "prefix_filter_jaccard_pairs",
    "csv_roundtrip_stats": "orc_roundtrip_stats",
    "xml_roundtrip_stats": "orc_roundtrip_stats",
}
