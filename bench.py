#!/usr/bin/env python
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], plus the flagship interleaved-docs validation
throughput (BASELINE.json metric: documents validated/sec).

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "docs_validated_per_sec": N, "cpus": N}

Execution is forced with the noop sink (full pipeline runs, zero collect
cost on the driver). Synthetic interleaved docs are generated once and
cached under .scratch/ (deterministic, seed=42).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Headline set: one per operator family from SURVEY.md §2 (near-duplicate
# variants left out to keep the signal tight; the driver's correctness gate
# still covers every query).
HEADLINE = [
    "validate_documents_violations",
    "validate_documents_flag",
    "validate_spans_offsets",
    "validate_props_json",
    "variant_dynamic_objects",
    "content_validate_props",
    "kw_recursive_tree_events",
    "variant_recursive_dynamic",
    "kw_logical_oneof",
    "kw_numeric_lineitem",
    "kw_string_customer",
    "stats_numeric_lineitem",
    "histogram_price_lineitem",
    "quantiles_lineitem",
    "heavy_hitters_parts",
    "dup_keys_lineitem",
    "referential_events_suppliers",
    "cardinality_orders",
    "ks_click_vs_view",
    "psi_lang_src",
    "ks_span_length_drift",
    "psi_span_kind_drift",
    "chi2_event_type_drift",
    "js_lang_docs",
    "wasserstein_value_events",
    "centroid_drift_embeddings",
    "dedup_exact_text_docs",
    "ngram_jaccard_docs",
    "minhash_signatures_docs",
    "lsh_candidate_pairs_docs",
    "containment_pairs_docs",
    "dup_clusters_docs",
    "dedup_best_docs",
    "shard_order_docs",
    "dedup_corpus_docs",
    "dedup_incremental_docs",
    "bloom_dedup_docs",
    "curate_corpus_docs",
    "simhash_docs",
    "text_quality_docs",
    "repetition_signals_docs",
    "top_bigram_docs",
    "boilerplate_docs",
    "clean_boilerplate_docs",
    "substring_dup_docs",
    "winnow_dup_docs",
    "substring_dedup_docs",
    "contamination_docs",
    "perplexity_docs",
    "bigram_perplexity_docs",
    "ppl_buckets_docs",
    "quality_model_docs",
    "redact_pii_docs",
    "domain_stats_docs",
    "url_dedup_docs",
    "domain_quota_docs",
    "pack_docs",
    "pack_stats_docs",
    "pack_interleaved_events",
    "span_interleave_events",
    "interleaved_filter_events",
    "canonical_spans_events",
    "media_context_events",
    "media_usage_events",
    "incremental_validate_events",
    "snapshot_churn_events",
    "skew_buckets_events",
    "source_overlap_docs",
    "multimodal_near_dup_docs",
    "interleaved_pipeline_docs",
    "span_lang_mixture_docs",
    "token_count_by_lang",
    "bpe_token_stats_docs",
    "fingerprint_docs",
    "sample_split_docs",
    "leakage_split_docs",
    "outliers_robust_lineitem",
    "consistency_docs",
    "stratified_sample_docs",
    "mixture_sample_docs",
    "temperature_sample_docs",
    "dsir_sample_docs",
    "keywords_tfidf_docs",
    "pmi_collocations_docs",
    "clean_text_docs",
    "c4_filter_docs",
    "gopher_quality_docs",
    "strip_html_docs",
    "web_pipeline_docs",
    "simsearch_topk",
    "sessionize_events",
    "attribution_asof_events",
    "range_window_stats_events",
    "weighted_sample_docs",
    "key_candidates_orders",
    "time_bucket_rollup_events",
    "funnel_events",
    "funnel_windowed_events",
    "retention_cohorts_events",
    "rolling_anomaly_events",
    "cusum_changepoints_events",
    "bm25_topk_docs",
    "hybrid_rrf_docs",
    "cms_tokens_docs",
    "scd2_history_events",
    "token_diversity_docs",
    "hard_negatives_embeddings",
    "assoc_rules_events",
    "pagerank_supplier_parts",
    "star_join_revenue",
    "pivot_lang_source_docs",
    "rollup_daily_events",
    "khop_supplier_parts",
    "triangles_copurchase_parts",
    "entity_matches_parts",
    "bpe_train_docs",
    "hll_registers_orders",
    "entity_resolve_parts",
    "cms_join_size_orders",
    "hll_daily_events",
    "skyline_parts",
    "greedy_cover_docs",
    "group_quantiles_lineitem",
    "cube_lang_source_docs",
    "logreg_quality_docs",
    "stream_hll_replay_events",
    "bins_quantity_lineitem",
    "zorder_layout_lineitem",
    "bpe_apply_docs",
    "span_mismatch_events",
    "media_features_fake",
    "defaults_fill_events",
    "cosine_near_dup_lsh",
    "ivf_topk_embeddings",
    "kmeans_cells_embeddings",
    "pq_topk_embeddings",
    "ivfpq_topk_embeddings",
    "ivfpq_residual_topk_embeddings",
    "semantic_dedup_embeddings",
    "proto_prune_embeddings",
    "quality_auc_docs",
    "encoding_quality_docs",
    "corpus_health_docs",
    "kmv_daily_events",
    "mmd_drift_embeddings",
    "compaction_plan_events",
    "cdc_apply_events",
    "forecast_backtest_events",
    "zone_map_audit_lineitem",
    "fd_discovery_customer",
    "benford_price_lineitem",
    "recluster_gain_lineitem",
    "interval_coverage_events",
    "stream_zone_map_replay_events",
    "json_schema_profile_events",
    "trend_slope_events",
    "concentration_events",
    "quality_threshold_docs",
    "quality_calibration_docs",
    "kmv_overlap_keys",
    "violation_code_stats_docs",
    "rank_churn_docs",
    "weekday_anomaly_events",
    "ann_topk_docs",
    "dedup_exact_events",
    "kw_const_ifthen",
    "kw_contains_spans",
    "kw_dependent_applicators_events",
    "kw_dependent_required_events",
    "kw_format_customer",
    "kw_logical_anyof_not",
    "kw_prefix_maxitems_spans",
    "kw_unevaluated_items_spans",
    "lang_id_docs",
    "localized_violations_docs",
    "partition_verdicts_docs",
    "referential_orders_clean",
    "span_transitions_events",
    "variant_nested_events",
    "violations_delta_docs",
]

# Contract entries deliberately NOT benched, with reasons. The partition
# HEADLINE + BENCH_EXCLUDED == all_queries() is pinned by
# tests/test_contract_counts.py so bench coverage can never silently drift
# from the driver contract again.
BENCH_EXCLUDED = {
    "cosine_near_dup_exact": "O(n^2) verifier twin of cosine_near_dup_lsh — "
    "exists only to ground-truth the LSH path; timing it would reward the "
    "anti-scale plan",
    "lsh_recall_embeddings": "recall/precision self-evaluation that re-runs "
    "the exact O(n^2) verifier internally; same reason as "
    "cosine_near_dup_exact",
}

N_SYNTH_DOCS = int(os.environ.get("SPARK_GRAFT_SYNTH_DOCS", "200000"))


def box_probe() -> float:
    """Single-core CPU probe (pure-Python md5 loop, ~0.2s on a quiet box):
    run before and after the bench so a noisy-neighbor window — during
    which EVERY query of a multi-second bench run inflates 2-6x — is
    visible IN the recorded JSON instead of masquerading as a code
    regression (observed repeatedly on this host; see BENCH/RUNS.md)."""
    import hashlib

    t0 = time.perf_counter()
    h = b"probe"
    for _ in range(400_000):
        h = hashlib.md5(h).digest()
    return round(time.perf_counter() - t0, 3)


def build_session(cpus: int):
    from pyspark.sql import SparkSession

    from jsonschema_spark.session import apply_engine_confs

    return (
        apply_engine_confs(SparkSession.builder.master(f"local[{cpus}]"))
        .appName("jsonschema-spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # SF-scale file-split tuning: the sf0.1 tables are single sub-MB
        # parquet files, so the default 128MB/4MB split sizing scans each
        # table in ONE task and every CPU-heavy narrow projection (minhash,
        # shingles, hyperplane folds) runs on one core. At production scale
        # the inputs arrive in thousands of >=128MB files and these two
        # knobs should stay at their defaults.
        .config("spark.sql.files.maxPartitionBytes", "262144")
        .config("spark.sql.files.openCostInBytes", "65536")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time_best(run, max_reps: int = 4) -> float:
    """Best-of-N with adaptive N: stop once the two fastest reps agree
    within 20% (JIT/codegen warm-up and noisy-neighbor windows otherwise
    leak into best-of-2 — observed 8.9/8.3 cold vs 3.3 warm on the same
    plan)."""
    times: list[float] = []
    for _ in range(max_reps):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
        if len(times) >= 2:
            fast = sorted(times)[:2]
            if fast[1] <= fast[0] * 1.2:
                break
    return min(times)


def ensure_synth_docs(spark, n_docs: int) -> str:
    """Deterministic interleaved docs table (input_hint shape), cached once."""
    path = os.path.join(REPO, ".scratch", f"synth_docs_{n_docs}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from jsonschema_spark.synth import SynthConfig, make_docs

        docs, _ref, _media = make_docs(spark, SynthConfig(n_docs=n_docs, seed=42))
        docs.repartition(32).write.mode("overwrite").parquet(path)
    return path


def flagship_throughput(spark, n_docs: int) -> tuple[float, float]:
    """Validate the interleaved spans table with the pure-Column plan;
    returns (elapsed_sec, docs_per_sec).

    Measured FIRST in the session for comparability, with the warm-up ON
    THE FULL-SIZE plan until the running minimum goes stable: C2 needs
    ~5 full-size invocations before the hot generated methods compile
    (measured on 200k docs, fresh JVM: 6.4 -> 1.8 -> 1.4 -> 1.3 -> 1.2 ->
    steady ~1.15s). Earlier protocols warmed on a 1/10-size table and then
    stopped on 'two agreeing reps' — but reps 2-3 of the full-size run
    agree with each other while still 2.4x off steady state, so the
    recorded number was a JIT artifact (the real source of the r1->r3
    'throughput slide' and of sub-70k readings afterwards).

    Stop rule: run until the best rep has not improved by >5% for 3
    consecutive reps (min 5, cap 20). A noisy-neighbor window inflates
    every rep uniformly; the recorded box_probe_sec values flag that case
    in the JSON artifact."""
    from jsonschema_spark.plans.columns import validate_dataframe
    from jsonschema_spark.synth import DOCS_SCHEMA

    path = ensure_synth_docs(spark, n_docs)
    df = spark.read.parquet(path)
    out = validate_dataframe(df, DOCS_SCHEMA)

    best = float("inf")
    stable = 0
    reps = 0
    for _ in range(20):
        t0 = time.perf_counter()
        _force(out)
        dt = time.perf_counter() - t0
        reps += 1
        if dt < best * 0.95:
            stable = 0
        else:
            stable += 1
        best = min(best, dt)
        if stable >= 3 and reps >= 5:
            break
    return best, n_docs / best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    # sf* tables are single-row-group parquet — spread scans so narrow
    # CPU-heavy projections use every core (see queries._t; unset at scale)
    os.environ.setdefault("SPARK_GRAFT_SPREAD_SCANS", str(cpus))

    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from jsonschema_spark.queries import all_queries

    qs = all_queries()
    _force(spark.range(10_000).selectExpr("sum(id) as s"))  # JVM warm-up

    # Flagship throughput is measured FIRST: each round adds headline
    # queries, so measuring it last put it in a progressively dirtier JVM
    # (GC/code-cache state drift made the round-over-round headline metric
    # unfalsifiable — the r1->r3 "slide" tracked bench ordering, not plans).
    probe_start = box_probe()
    times: dict[str, float] = {}
    flag_dt, docs_per_sec = flagship_throughput(spark, N_SYNTH_DOCS)
    times["validate_interleaved_synth"] = round(flag_dt, 3)

    for name in HEADLINE:
        times[name] = round(_time_best(lambda: _force(qs[name](spark, sf_dir))), 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "docs_validated_per_sec": round(docs_per_sec, 1),
                "synth_docs": N_SYNTH_DOCS,
                "cpus": cpus,
                # ~0.2s when the box is quiet; >0.5s means a noisy-neighbor
                # window inflated the timings above (see box_probe docstring)
                "box_probe_sec": [probe_start, box_probe()],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
