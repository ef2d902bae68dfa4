#!/usr/bin/env python
"""Generate PLANS.md: physical-plan audit of the headline queries.

For each headline query, records the scale-relevant plan facts —
exchanges (shuffles), join strategies, pushed filters, read schemas,
AQE — so plan regressions are reviewable in diffs.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "pricing_summary",
    "revenue_by_nation",
    "shipping_priority",
    "promo_revenue_by_supp_nation",
    "cdc_split_updated",
    "top3_orders_per_segment",
    "sliding_window_refresh",
    "minhash_dedup_pairs",
    "ann_lsh_topk",
    "sessionize_events",
    "asof_last_view_before_purchase",
    "views_before_purchase_ranged",
    "ann_ivf_topk",
    "grouping_sets_revenue",
    "corr_regression_qty_price",
    "bilateral_trade_volume",
    "corpus_curation_pipeline",
    "fuzzy_part_name_pairs",
    "salted_quantity_by_flag",
    "sequence_packing",
    "simhash_near_pairs",
    "ann_lsh_multitable_topk",
    "doc_repetition_stats",
    "sole_late_suppliers",
    "maintained_rollup_equiv",
    "cdc_replay_equiv",
    "returned_item_customers",
    "nation_market_share",
    "top_revenue_supplier",
    "small_quantity_revenue_loss",
    "disjunctive_band_revenue",
    "profit_by_nation_year",
    "pii_redaction_stats",
    "domain_extraction_stats",
    "prefix_jaccard_pairs",
    "data_quality_report",
    "sketch_distinct_maintenance",
    "boilerplate_removal",
    "document_chunks",
    "oov_rate_by_lang",
    "retention_cohorts",
    "embedding_dim_stats",
    "daily_peak_concurrency",
    "winsorized_order_stats",
    "dedup_keep_best",
    "temperature_mixture",
    "forecast_revenue_change",
    "passage_dup_stats",
    "cluster_safe_splits",
    "tokenizer_fertility_by_lang",
    "late_ship_priority_orders",
    "event_transition_matrix",
    "rolling_7d_active_users",
    "decile_spend_profile",
    "session_funnel",
    "source_lang_affinity",
    "media_frame_sample",
    "stateful_session_equiv",
    "join_key_skew_profile",
    "incremental_dedup_pairs",
    "zorder_key_stats",
    "weighted_sample_docs",
    "unigram_logprob_scores",
    "derived_surrogate_key",
    "bpe_pair_counts",
    "bm25_search_topk",
    "dup_cluster_histogram",
    "quota_sample_sources",
    "label_centroid_quality",
    "tfidf_cosine_pairs",
    "interpolated_daily_values",
    "event_value_outliers",
    "scd2_priority_history",
    "touch_attribution_paths",
    "benchmark_decontamination",
    "source_pair_jaccard",
    "zipf_fit_top_tokens",
    "pagerank_trade_graph",
    "ewma_user_daily_value",
    "cms_token_frequency",
    "snapshot_diff_orders",
    "rrf_fusion_topk",
    "ann_pq_adc_recall",
    "bpe_learned_merges",
    "ts_similarity_blocked_pairs",
    "hybrid_search_topk",
    # round-4c .. 4f surface
    "sorted_neighborhood_dups",
    "ohlc_daily_bars",
    "purged_fold_report",
    "bigram_logprob_scores",
    "ann_sq8_recall",
    "bpe_encode_stats",
    "pca_top_component",
    "psi_value_drift",
    "event_pair_rules",
    "nation_triangle_counts",
    "segment_target_encoding",
    "native_session_rollup",
    "ann_multiprobe_recall",
    "source_temperature_mix",
    "doc_novelty_scores",
    "value_median_mad_by_type",
    "window_toolbox_orders",
    "quality_pr_curve",
    "top3_per_segment_agg",
    "value_quartiles_by_type",
    "cube_order_counts",
    "source_signature_terms",
    "label_projection_stats",
    "lang_id_confusion",
    "score_reliability_bins",
    "cooccurrence_rec_hitrate",
    "rank_normalized_value_by_type",
    "pca_top2_components",
    "hll_source_overlap",
    # round-5
    "containment_dedup_pairs",
    "split_leakage_report",
    "gopher_quality_report",
    "corpus_budget_coverage",
    "embedding_norm_health",
    "doc_length_auc_by_source",
    "mase_seasonal_screen",
    "adamic_adar_order_links",
    "mmr_diversified_topk",
    "unpivot_order_metrics",
    "unpivot_status_metrics",
    # round-14
    "media_dimensions_report",
    "similar_user_activity_ann",
    "concat_chunk_packing_report",
    # round-6 (curation_counts_report is omitted: its builder RUNS
    # the curate_corpus pipeline and returns a one-row count frame,
    # so its plan is a LocalRelation — the pipeline's plan facts are
    # audited via corpus_curation_pipeline above)
    "rm3_expanded_bm25",
    "minhash_jaccard_calibration",
    "trigram_lm_scores",
    "cc_cluster_sizes",
    "heaps_law_vocab_fit",
    "mmr_ivf_topk",
    # r06: the Jaccard-family verifiers after the forced-broadcast
    # removal (re-audited — `sizes` joins are now AQE-chosen)
    "ngram_jaccard_pairs",
    # round-6b
    "semdedup_cluster_pairs",
    "ivf_probe_recall_sweep",
    "heavy_hitter_tokens",
    "readability_by_source",
    "cusum_value_changepoints",
    "lsh_band_sweep",
    "semdedup_recall_audit",
    "ann_ivf_incremental",
    # r06b: re-audited after the km_centroids train-once artifact
    "ann_ivf_kmeans_recall",
    # r06b: re-audited after the one-scan max_by corpus assignment
    "ann_ivf_recall",
    "ann_ivfpq_recall",
    # r09: URL-tier + windowed-substring dedup families, DSIR
    "url_domain_dedup_health",
    "cross_doc_dup_spans",
    "dsir_importance_scores",
    # r10 (curation_v3_counts_report omitted for the same reason as
    # curation_counts_report: its builder RUNS the pipeline and
    # returns a LocalRelation of counts)
    "lang_id_ngram_profile",
    "merged_span_coverage",
    "quality_keeper_dedup",
    "gopher_repetition_fractions",
    "ccnet_perplexity_buckets",
    "hard_negative_mining",
    "epoch_shuffle_manifest",
    "streaming_dedup_equiv",
    "cluster_quality_representatives",
    "hard_negative_ivf_mining",
    "benchmark_span_contamination",
    "source_contamination_rollup",
    # r11 (the v3 lite/attribution reports omitted — like the other
    # counts reports their builders RUN the pipeline and return a
    # LocalRelation). epoch_shuffle_manifest above re-audits the
    # distributed-rank rewrite.
    "token_ngram_contamination",
    "token_contamination_rollup",
    "token_span_coverage",
    "streaming_span_dedup_equiv",
    "keeper_fallback_drops",
    "nb_quality_classifier",
    "span_threshold_sweep",
    "epoch_shuffle_shard_manifest",
    "token_dup_rate_by_source",
    "keeper_policy_delta",
    # r11b post-queue wave
    "span_removal_rewrite",
    "semantic_decontamination",
    "matryoshka_recall_sweep",
    "part_ship_overlap_pairs",
    "token_budget_selection",
    "curriculum_phase_manifest",
    "scoped_vs_global_dedup",
    "quality_ensemble_rank",
    "doremi_mixture_weights",
    "dsir_vs_nb_agreement",
    "unimax_language_budgets",
    "l_diversity_report",
    "ann_matryoshka_topk",
    "dup_span_mask_manifest",
    # round-12/13 (dedup_sidecar_equiv and sidecar_compaction_equiv
    # are deliberately absent: their builders execute the per-batch
    # fold through real sidecar files, so the returned frame's plan
    # is a local relation — nothing for a static audit to read; the
    # per-batch probe plans are the same shapes
    # streaming_span_dedup_equiv audits)
    "token_budget_equalized",
]


def main() -> None:
    from etl_python_azure_spark.queries import registry
    from etl_python_azure_spark.session import get_spark

    from etl_python_azure_spark.queries._artifacts import (
        artifact_consumers,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-dump")
    reg = registry()
    artifact_served = artifact_consumers()

    lines = [
        "# PLANS — physical-plan audit (auto-generated)",
        "",
        f"`python scripts/dump_plans.py` over `{sf_dir}`. For each",
        "headline query: shuffle count, join strategies, and scan",
        "pushdown evidence from the executed plan (pre-AQE initial",
        "plan; AQE re-plans shuffles at runtime).",
        "",
    ]
    for name in QUERIES:
        df = reg[name].builder(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_ex = plan.count("Exchange")
        joins = {
            "BroadcastHashJoin": plan.count("BroadcastHashJoin"),
            "SortMergeJoin": plan.count("SortMergeJoin"),
            "ShuffledHashJoin": plan.count("ShuffledHashJoin"),
            "BroadcastNestedLoopJoin": plan.count("BroadcastNestedLoopJoin"),
        }
        join_str = ", ".join(f"{k}×{v}" for k, v in joins.items() if v) or "none"
        # Spark truncates long filter lists with "..." (no closing
        # bracket) — stay within the line
        pushed = re.findall(r"PushedFilters: \[([^\]\n]+?)[\]\n]", plan + "\n")
        # iterative queries re-embed the same scan text per unrolled
        # round — dedupe with multiplicities so the audit stays
        # reviewable (the Notes section explains the inflation)
        from collections import Counter

        pc = Counter(
            p.split(", ReadSchema")[0] for p in pushed if p.strip()
        )
        pushed_str = (
            "; ".join(
                f"{f} (×{n})" if n > 1 else f
                for f, n in sorted(pc.items())
            )
            or "—"
        )
        # struct<> may be truncated mid-line ("...") — never cross a
        # newline, or a multi-scan plan bleeds other operators in
        schemas = re.findall(r"ReadSchema: struct<([^>\n]*)", plan)
        cols_read = sorted({c.split(":")[0] for s in schemas for c in s.split(",") if c})
        lines += [
            f"## {name}",
            "",
            f"- exchanges: {n_ex}",
            f"- joins: {join_str}",
            f"- pushed filters: {pushed_str}",
            f"- columns read: {', '.join(cols_read) if cols_read else '—'}",
        ]
        if name in artifact_served:
            lines.append(
                "- note: serves (at least partly) from a"
                " localCheckpoint-ed train-once artifact"
                " (queries/_artifacts.py) — the training pipeline runs"
                " at fit time, once per process, so this audited plan"
                " is the steady-state serving shape"
            )
        elif "ExistingRDD" in plan:
            lines.append(
                "- note: plan includes a per-query localCheckpoint"
                " (bounded intermediate materialized within this"
                " query's own run — lineage truncation, not the"
                " train-once artifact cache)"
            )
        lines.append("")

    lines += [
        "## Notes",
        "",
        "- derived_surrogate_key (r03 verdict item 7): the 0.52 s →"
        " 0.84 s r03 bench delta was noise, not a plan change — the"
        " plan is still the minimal pruned scan (4 columns) + one"
        " WholeStageCodegen project, zero exchanges, and the r04"
        " bench run is back at ~0.46 s.",
        "",
        "- Iterative/persisted queries (pagerank_trade_graph,"
        " bpe_learned_merges) have inflated tallies above: their"
        " loop-carried tables are persisted, and every"
        " InMemoryRelation in the unrolled plan re-embeds its"
        " originating scan+join text, so each embedded description"
        " is counted once per iteration/reference. At runtime the"
        " base scans execute once and each round reads the cache"
        " (e.g. pagerank: one broadcast join of the 25-row rank"
        " vector onto the cached edge table per iteration;"
        " InMemoryTableScan appears 208×, the parquet scans run"
        " once).",
        "",
        "- Eager-checkpoint queries (r13 conversion + the r14 fold"
        " audit: the LSH/minhash family, ts_similarity_blocked_pairs,"
        " hll_source_overlap, the basket pair stats, the curation"
        " chains, similar_user_activity_ann) materialize their"
        " shared frames at BUILDER time, so the executed plan shown"
        " above collapses those subtrees to Scan ExistingRDD — the"
        " tallies describe only the post-checkpoint stages, and"
        " 'columns read' omits the upstream parquet scans that ran"
        " inside the checkpoint. That is the true steady-state"
        " serving shape (the upstream pipeline runs exactly once),"
        " NOT missing pushdown. For a full-lineage static audit set"
        " SPARK_GRAFT_LAZY_PLANS=1 (builders skip the eager"
        " checkpoints; plans print without executing — never use it"
        " for timed runs).",
        "",
        "- Whole-bench variance (r05 observation): three identical"
        " full runs on the same commit measured 116 s / 207 s /"
        " 166 s totals with EVERY query drifting together — the"
        " machine's background load moves run totals by up to ~1.8x."
        " Compare per-round benches only against the query MIX and"
        " relative row deltas, not absolute totals; the 116 s run"
        " (quiet machine) is the steady-state reading for the r05"
        " surface (127 rows incl. the new curation pipeline).",
        "",
        "- Jaccard/containment verifier joins (r05 verdict item 1,"
        " fixed r06): ngram_jaccard_pairs / containment_pairs /"
        " the minhash & prefix verify tiers no longer FORCE-broadcast"
        " the corpus-cardinality per-document `sizes` frame — the"
        " hint is gone from operators/dedup.py, so any"
        " BroadcastHashJoin still shown for those queries above is"
        " AQE/size-estimate-chosen at this SF and degrades to a"
        " shuffle join when `sizes` outgrows the threshold, instead"
        " of dying at Spark's 8 GB broadcast hard limit at 100 TB.",
        "",
        "- IVF corpus assignment (r06): `_nearest_cells`' rank-1"
        " path — Lloyd rounds, ivf_assign, the SemDeDup bucketing —"
        " is a one-scan max_by hash aggregate over the broadcast"
        " cross join (partial aggregation collapses to one row per"
        " vector per partition before anything shuffles), replacing"
        " a window that sorted all n×K cross-join rows with the"
        " embedding payload attached; plus a compute-parallelism"
        " repartition gate for single-file bench scans. Identical"
        " winner (max_by key = (cos, -centroid_id) ≡ ORDER BY cos"
        " DESC, centroid_id ASC); 23.6 s → 1.4 s at 20 k × 160"
        " cells, and the K ∝ n SemDeDup configuration becomes"
        " sublinear (SCALING.md round-6 rows). Affected plans above:"
        " ann_ivf_topk/recall/kmeans_recall/ivfpq_recall,"
        " mmr_ivf_topk, semdedup_cluster_pairs,"
        " ivf_probe_recall_sweep.",
        "",
        "- Bench artifacts are load-aware as of r06: bench.py times a"
        " fixed CPU kernel before/after the query loop and records it"
        " as `calib_sec` in both the summary line and"
        " BENCH_DETAIL.json (quiet-machine reference ~0.08 s);"
        " SPARK_GRAFT_BENCH_REPEATS=N additionally stores per-query"
        " run lists and keeps the min. Compare calib_sec first,"
        " per-query rows second.",
        "",
        "- latinad_full_refresh bench variance: mid-r04 runs measured"
        " 9.3–10.8 s (vs 6.75 s in BENCH_r03) — re-running the exact"
        " r03 commit (e228bb5) in a clean worktree reproduced 9.3 s,"
        " so the delta is machine/load variance of the HTTP-fan-out"
        " e2e, not a plan or code regression. The plan is unchanged.",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
