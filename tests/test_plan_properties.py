"""Physical-plan regression guards for the headline queries.

If a future change makes a dimension join stop broadcasting, adds an
unexpected shuffle to the flagship aggregate, or drops scan-level
filter pushdown, these fail before the benchmark regresses.
"""

from __future__ import annotations

import pytest

from etl_python_azure_spark.queries import registry


def _plan(spark, sf_dir, name):
    df = registry()[name].builder(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_single_exchange(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    assert plan.count("Exchange") == 1  # just the groupBy shuffle
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_revenue_by_nation_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(spark, sf_dir, "revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 2  # customer + nation at least
    assert "SortMergeJoin" not in plan or plan.count("BroadcastHashJoin") >= 2


def test_cdc_probe_is_narrow_and_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "cdc_split_updated")
    assert "BroadcastHashJoin" in plan
    # probe side projects only (key, version): payload col absent from
    # the probe-side scan schema
    probe_scans = [
        seg for seg in plan.split("ReadSchema: ")[1:] if "o_totalprice" not in seg.split("\n")[0]
    ]
    assert probe_scans, "expected a narrow (o_orderkey, o_orderdate) scan"


def test_filter_pushdown_everywhere(spark, sf_dir):
    for name in ("filter_project_scale", "filter_events", "shipping_priority"):
        plan = _plan(spark, sf_dir, name)
        assert "PushedFilters: [" in plan, name


def test_no_cartesian_in_join_queries(spark, sf_dir):
    # cross joins are only intentional in similarity brute force
    for name in (
        "left_join_enrich",
        "revenue_by_nation",
        "shipping_priority",
        "cdc_split_updated",
        "dropna_after_left_join",
        "prefix_jaccard_pairs",
        "returned_item_customers",
        "nation_market_share",
        "profit_by_nation_year",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name


def test_corpus_pipeline_is_single_scan_no_joins(spark, sf_dir):
    # quality gate + dedup + sample + token budget must stay one
    # corpus scan (carry-through projections + window dedup) — a
    # join-back or second scan here multiplies 100 TB of reads
    plan = _plan(spark, sf_dir, "corpus_curation_pipeline")
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") <= 2  # fingerprint window + source agg


def test_range_join_query_is_hash_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "views_before_purchase_ranged")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_simhash_near_pairs_is_equi_join(spark, sf_dir):
    # pigeonhole chunk blocking must plan as a hash equi-join on
    # (chunk_idx, chunk_val) — never an all-pairs cartesian/BNLJ
    plan = _plan(spark, sf_dir, "simhash_near_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_sequence_packing_no_single_partition_window(spark, sf_dir):
    # the corpus-wide running token sum must be the two-phase prefix
    # sum (window partitioned by contiguous buckets) — a global
    # Window.orderBy plans as `Exchange SinglePartition` + one task
    # holding the whole corpus
    plan = _plan(spark, sf_dir, "sequence_packing")
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_bilateral_trade_broadcasts_all_dimensions(spark, sf_dir):
    plan = _plan(spark, sf_dir, "bilateral_trade_volume")
    assert plan.count("BroadcastHashJoin") >= 4
    # the nation-pair predicate reaches both nation scans
    assert "EqualTo(n_name,NATION_1)" in plan


def test_round3_plan_shapes(spark, sf_dir):
    """Lock the audited round-3 plans: no quadratic joins, no
    unplanned single-partition stages, broadcasts where expected."""
    # per-row explodes: no join at all, ≤2 exchanges (agg + distinct)
    for name in ("passage_dup_stats", "media_frame_sample"):
        plan = _plan(spark, sf_dir, name)
        assert "Join" not in plan, name
    # semi-join probe for TPC-H Q4 shape stays broadcast at test SF
    plan = _plan(spark, sf_dir, "late_ship_priority_orders")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    # contingency marginals broadcast back onto cells
    plan = _plan(spark, sf_dir, "source_lang_affinity")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    # threshold lookup is a broadcast of a 1-row aggregate — the only
    # nested-loop join allowed; corpus side must not CartesianProduct
    plan = _plan(spark, sf_dir, "decile_spend_profile")
    assert "CartesianProduct" not in plan
    # rolling fanout is explode + hash agg — no range join fallback
    plan = _plan(spark, sf_dir, "rolling_7d_active_users")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # incremental dedup: candidate generation is an equi-join
    plan = _plan(spark, sf_dir, "incremental_dedup_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_transition_matrix_windows_are_partitioned(spark, sf_dir):
    # both windows must carry a partition spec (user_id / prev_type) —
    # never a global single-partition window
    plan = _plan(spark, sf_dir, "event_transition_matrix")
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "#" in spec.split(",")[0], spec  # first arg is a column


def test_round4_plan_shapes(spark, sf_dir):
    """Lock the audited round-4 plans: token joins stay hash
    equi-joins (never cartesian), tiny stat frames broadcast, the
    quota window never collapses to a single partition."""
    # BM25: posting-list equi-joins + 1-row stats broadcast; the only
    # nested-loop is the stats crossJoin (1 row, broadcast)
    plan = _plan(spark, sf_dir, "bm25_search_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # TF-IDF pairs: the token self-join must be a hash join
    plan = _plan(spark, sf_dir, "tfidf_cosine_pairs")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    )
    # BPE: no joins at all — two aggregates over one scan
    plan = _plan(spark, sf_dir, "bpe_pair_counts")
    assert "Join" not in plan
    # quota sampling: per-group window, never Exchange SinglePartition
    plan = _plan(spark, sf_dir, "quota_sample_sources")
    assert "SinglePartition" not in plan
    # centroid QA: C-row centroid table broadcasts back onto corpus
    plan = _plan(spark, sf_dir, "label_centroid_quality")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # outliers: moment table broadcast, no cartesian
    plan = _plan(spark, sf_dir, "event_value_outliers")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_round4b_plan_shapes(spark, sf_dir):
    """Round-4b audited shapes: window ops never collapse to a single
    partition, shingle/token joins stay equi-joins, PageRank's
    per-iteration join-agg never goes cartesian."""
    # SCD2: windows partitioned by customer, no joins at all
    plan = _plan(spark, sf_dir, "scd2_priority_history")
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    # attribution: same — three windows over one (user) partitioning
    plan = _plan(spark, sf_dir, "touch_attribution_paths")
    assert "SinglePartition" not in plan
    assert "Join" not in plan  # pure window pipeline, no self-join
    # decontamination: shingle equi-join, never |train| x |eval|
    plan = _plan(spark, sf_dir, "benchmark_decontamination")
    assert "CartesianProduct" not in plan
    # source similarity: shingle-keyed self-join + broadcast sizes
    plan = _plan(spark, sf_dir, "source_pair_jaccard")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # pagerank: every iteration is an equi-join; nothing cartesian,
    # nothing single-partition except the final 25-row sort-less agg
    plan = _plan(spark, sf_dir, "pagerank_trade_graph")
    assert "CartesianProduct" not in plan


def test_round4c_plan_shapes(spark, sf_dir):
    """CMS / snapshot-diff / RRF / PQ / BPE audited shapes."""
    # CMS: cell table broadcasts onto the probe side, no cartesian
    plan = _plan(spark, sf_dir, "cms_token_frequency")
    assert "CartesianProduct" not in plan
    # snapshot diff: ONE full-outer join, key-shuffled, no cartesian
    plan = _plan(spark, sf_dir, "snapshot_diff_orders")
    assert plan.count("FullOuter") >= 1
    assert "CartesianProduct" not in plan
    # RRF: fusion of two top-N lists, no corpus-sized join
    plan = _plan(spark, sf_dir, "rrf_fusion_topk")
    assert "CartesianProduct" not in plan
    # PQ ADC: codebook/LUT broadcast onto codes, never cartesian
    plan = _plan(spark, sf_dir, "ann_pq_adc_recall")
    assert "BroadcastHashJoin" in plan
    # BPE: windows stay partitioned by word, no single-partition sort
    # (the 1-row best-pair frames legitimately broadcast). r14 made
    # the per-round tables EAGER checkpoints, so the consume-side
    # plan collapses to ExistingRDD scans — audit the full logical
    # shape through the SPARK_GRAFT_LAZY_PLANS escape hatch instead.
    import os

    os.environ["SPARK_GRAFT_LAZY_PLANS"] = "1"
    try:
        plan = _plan(spark, sf_dir, "bpe_learned_merges")
    finally:
        del os.environ["SPARK_GRAFT_LAZY_PLANS"]
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_round4c_new_ops_plan_shapes(spark, sf_dir):
    """Audited shapes for the sorted-neighborhood / OHLC / purged-CV
    / bigram-LM / SQ8 / BPE-encode batch."""
    # sorted neighborhood: the offset-exploded neighborhood join is a
    # hash equi-join on rn — never cartesian, never single-partition
    # (global_row_number's whole point)
    plan = _plan(spark, sf_dir, "sorted_neighborhood_dups")
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )
    # OHLC: ONE hash-agg shuffle, no join, no window sort of the
    # stream (min_by/max_by, not ROW_NUMBER)
    plan = _plan(spark, sf_dir, "ohlc_daily_bars")
    assert "Join" not in plan
    assert "Window" not in plan
    # purged CV: 1-row span + k-row folds broadcast; corpus never
    # shuffles for the assignment
    plan = _plan(spark, sf_dir, "purged_fold_report")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    # bigram LM: model join is an equi-join, never |docs| x |vocab²|
    plan = _plan(spark, sf_dir, "bigram_logprob_scores")
    assert "CartesianProduct" not in plan
    # SQ8: queries broadcast over the codes scan (intentional
    # broadcast nested loop = compressed linear scan), stats 1-row
    plan = _plan(spark, sf_dir, "ann_sq8_recall")
    assert "CartesianProduct" not in plan
    # BPE encode: same loop as the trainer — merge frames broadcast
    plan = _plan(spark, sf_dir, "bpe_encode_stats")
    assert "CartesianProduct" not in plan


def test_round4d_plan_shapes(spark, sf_dir):
    """Audited shapes for the PCA / PSI / rules / triangles /
    encoding / native-session batch."""
    # PCA: the d² covariance agg and tiny-frame matvecs — the only
    # nested loops are 1-row broadcasts (count, norm, eigenvalue)
    plan = _plan(spark, sf_dir, "pca_top_component")
    assert "CartesianProduct" not in plan
    # PSI: 1-row span broadcast; corpus shuffles only for the two
    # hash aggregates
    plan = _plan(spark, sf_dir, "psi_value_drift")
    assert "CartesianProduct" not in plan
    # rules: basket self-join is an equi-join on the basket key
    plan = _plan(spark, sf_dir, "event_pair_rules")
    assert "CartesianProduct" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )
    # triangles: dims broadcast, edge joins equi, nothing cartesian
    plan = _plan(spark, sf_dir, "nation_triangle_counts")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # target encoding: customer dim broadcast onto orders
    plan = _plan(spark, sf_dir, "segment_target_encoding")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # native session_window: ONE aggregate, no join, no self-window
    plan = _plan(spark, sf_dir, "native_session_rollup")
    assert "Join" not in plan


def test_round4e_plan_shapes(spark, sf_dir):
    """Audited shapes for the multi-probe / mix / novelty / robust
    stats / PR-sweep batch."""
    # multi-probe: probe fan-out joins corpus buckets as equi-joins
    plan = _plan(spark, sf_dir, "ann_multiprobe_recall")
    assert "CartesianProduct" not in plan
    # novelty: shingle equi-join + per-doc agg, never pairs
    plan = _plan(spark, sf_dir, "doc_novelty_scores")
    assert "CartesianProduct" not in plan
    # median/MAD: windows stay partitioned by the group key
    plan = _plan(spark, sf_dir, "value_median_mad_by_type")
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    # PR sweep: 1-row span + 9-row spine broadcast over one scan
    plan = _plan(spark, sf_dir, "quality_pr_curve")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    # window toolbox: both windows partitioned by customer
    plan = _plan(spark, sf_dir, "window_toolbox_orders")
    assert "SinglePartition" not in plan
    assert "PushedFilters: [" in plan  # o_custkey < 200 reaches scan


def test_round4f_plan_shapes(spark, sf_dir):
    """Audited shapes for the agg-top-k / quartiles / CUBE batch."""
    # agg top-k: no window sort anywhere — two hash aggregates; the
    # window formulation it replaces would show a Window node
    plan = _plan(spark, sf_dir, "top3_per_segment_agg")
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    # quartiles: window stays partitioned by event_type
    plan = _plan(spark, sf_dir, "value_quartiles_by_type")
    assert "SinglePartition" not in plan
    # CUBE: one Expand + one shuffle, no join
    plan = _plan(spark, sf_dir, "cube_order_counts")
    assert "Expand" in plan
    assert "Join" not in plan


def test_round4h_plan_shapes(spark, sf_dir):
    """Audited shapes for the evaluation/rank batch."""
    # lang-id eval: stopword dim broadcasts, nothing cartesian
    plan = _plan(spark, sf_dir, "lang_id_confusion")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # reliability: 1-row span broadcast over one scan
    plan = _plan(spark, sf_dir, "score_reliability_bins")
    assert "CartesianProduct" not in plan
    # recommender eval: rule table broadcast; the hit membership
    # probe is ONE LeftOuter join with a match indicator (r05 review
    # catch: the former semi+anti pair probed the identical join
    # twice)
    plan = _plan(spark, sf_dir, "cooccurrence_rec_hitrate")
    assert "CartesianProduct" not in plan
    assert "LeftOuter" in plan
    assert "LeftSemi" not in plan and "LeftAnti" not in plan
    # global rank transform: two-pass row number — the only
    # SinglePartition exchange is the 1-row global count's final
    # aggregate (bytes); the rank WINDOW itself stays partitioned
    plan = _plan(spark, sf_dir, "rank_normalized_value_by_type")
    assert plan.count("SinglePartition") <= 1
    assert "Window" in plan and "__pid" in plan


def test_gopher_repetition_fractions_zero_exchange(spark, sf_dir):
    """The repetition-fraction table is pure per-row sorted-array
    folds — if a refactor introduces ANY shuffle, the 100 TB claim
    (one scan, no exchange) is gone."""
    plan = _plan(spark, sf_dir, "gopher_repetition_fractions")
    assert plan.count("Exchange") == 0
    assert "ReadSchema" in plan and "text" in plan


def test_hard_negative_mining_broadcasts_queries(spark, sf_dir):
    """The query side must broadcast (mining runs per batch); the
    corpus side stays partitioned — a SortMergeJoin here means the
    corpus got shuffled for a 10-row probe."""
    plan = _plan(spark, sf_dir, "hard_negative_mining")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_lazy_plans_flag_keeps_builders_lazy_and_correct(
    spark, sf_dir, monkeypatch
):
    """SPARK_GRAFT_LAZY_PLANS=1 (r13 ADVICE): builders skip the
    eager checkpoints, so plan inspection shows the FULL tree (the
    parquet scan, not Scan ExistingRDD) without executing the
    pipeline — and the result multiset is identical to eager mode
    (shared subtrees recompute; semantics unchanged)."""
    from etl_python_azure_spark.queries import registry

    reg = registry()
    name = "minhash_dedup_pairs"
    eager_df = reg[name].builder(spark, sf_dir)
    eager_plan = eager_df._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in eager_plan  # eager mode: checkpointed

    monkeypatch.setenv("SPARK_GRAFT_LAZY_PLANS", "1")
    lazy_df = reg[name].builder(spark, sf_dir)
    lazy_plan = lazy_df._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" not in lazy_plan  # full lineage survives
    assert "parquet" in lazy_plan.lower()

    assert sorted(map(tuple, lazy_df.collect())) == sorted(
        map(tuple, eager_df.collect())
    )
