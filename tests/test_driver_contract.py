"""Guards on the round-driver contract (__spark_entry__ + bench)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_registry_shape():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 60
    # every oracle refers to a registered query
    assert set(oracles) <= set(qs)
    # builders are callables; oracle SQL is non-empty text
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_bench_emits_one_json_line(sf_dir, tmp_path):
    detail = str(tmp_path / "detail.json")
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_DETAIL=detail,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    # the driver captures only the tail of stdout — r04's full
    # per-query map outgrew it and the bench gate recorded
    # parsed:null. Hard ceiling so the line always survives capture.
    assert len(line.encode()) <= 2048, f"bench line {len(line)}B > 2KB"
    payload = json.loads(line)
    assert payload["unit"] == "sec" and payload["queries"]
    assert payload["value"] > 0
    assert payload["n_queries"] >= len(payload["queries"])
    # full per-query map lands in the (redirected) detail file
    d = json.load(open(detail))
    assert len(d["queries"]) == payload["n_queries"]
    assert d["value"] == payload["value"]


def test_driver_window_invariants():
    """The correctness driver records the FIRST 50 registry entries;
    guard the invariants that make the window worth its slots: 50
    unique names, all registered, and every registry query has an
    oracle (no rows-only entries slip back in) with no nested output
    columns (the driver's canonicalizer cannot hash them)."""
    from etl_python_azure_spark.queries import _R12_WINDOW, registry

    reg = registry()
    # the r12 list deliberately OVERFLOWS 50 (missing-name armor:
    # the driver records the first 50 resolvable entries, so a typo
    # slides fill up instead of shrinking the window)
    resolvable = [n for n in _R12_WINDOW if n in reg]
    assert len(resolvable) >= 50
    assert len(set(_R12_WINDOW)) == len(_R12_WINDOW)
    assert list(reg)[:50] == resolvable[:50]
    assert all(spec.oracle is not None for spec in reg.values())
    # r12 mandate (r11 verdict, top_next): slots 1-6 are the queries
    # whose plan or oracle changed this round (the r11 ADVICE/perf
    # items + the v3-chain lineage-truncation fix), slots 7-8 the
    # queries NEW in round 12, then the 35 r04-cohort names booked
    # at the r11 window tail (cms_token_frequency on, alphabetical),
    # then r05-cohort fill
    changed_r12 = [
        "lang_id_ngram_profile", "part_ship_overlap_pairs",
        "unimax_language_budgets", "curation_v3_counts_report",
        "curation_v3_counts_lite", "curation_drop_attribution",
    ]
    new_r12 = ["dedup_sidecar_equiv", "token_budget_equalized"]
    r04_thirty_five = [
        "cms_token_frequency", "daily_purchase_rate_ci",
        "doc_novelty_scores", "dup_cluster_histogram",
        "event_value_outliers", "ewma_user_daily_value",
        "hybrid_search_topk", "interpolated_daily_values",
        "k_anonymity_report", "label_centroid_quality",
        "label_noise_scan", "nation_triangle_counts",
        "native_session_rollup", "ohlc_daily_bars",
        "pagerank_trade_graph", "positional_unnest_embeddings",
        "psi_value_drift", "quality_pr_curve",
        "quota_sample_sources", "rrf_fusion_topk",
        "scd2_point_in_time", "scd2_priority_history",
        "session_funnel", "snapshot_diff_orders",
        "sorted_neighborhood_dups", "source_pair_jaccard",
        "stateful_session_equiv", "tfidf_cosine_pairs",
        "touch_attribution_paths", "ts_similarity_blocked_pairs",
        "ts_similarity_bruteforce_topk", "unigram_logprob_scores",
        "value_median_mad_by_type", "zipf_fit_top_tokens",
        "zorder_key_stats",
    ]
    assert _R12_WINDOW[:6] == changed_r12
    assert _R12_WINDOW[6:8] == new_r12
    assert _R12_WINDOW[8:43] == r04_thirty_five
    # the r05-cohort fill is alphabetical (stalest cohort first; the
    # tail past the 50-cut heads the r13 queue)
    r05_fill = _R12_WINDOW[43:]
    assert r05_fill == sorted(r05_fill)
    # every r12-new name must resolve by round end (they land over
    # the round's commits; the `resolvable` armor above keeps the
    # window at 50 meanwhile)
    missing = [n for n in new_r12 if n not in reg]
    assert not missing or len(resolvable) >= 50, missing


def _script_names(filename: str, attrs: list[str]) -> list[str]:
    """Load name lists from a repo-root script (bench.py,
    scripts/dump_plans.py) without importing it as a package — the
    scripts import nothing at top level that needs Spark."""
    import importlib.util
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, filename)
    spec = importlib.util.spec_from_file_location("m_", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["m_"] = mod
    spec.loader.exec_module(mod)
    out: list[str] = []
    for a in attrs:
        out += getattr(mod, a)
    return out


def _coupled_names(source: str) -> list[str]:
    """Every list in the repo that names registry queries, by key.
    IMPORTANT: callers must call registry() BEFORE this for the
    sources populated by query-module imports (artifact consumer
    sets) — the reverse order passes vacuously on an empty set when
    a test runs standalone (the r06 item-7 fix pattern)."""
    if source == "bench":
        return _script_names("bench.py", ["HEADLINE", "OPTIONAL"])
    if source == "plan_audit":
        return _script_names(
            os.path.join("scripts", "dump_plans.py"), ["QUERIES"]
        )
    if source == "window_r09":
        from etl_python_azure_spark.queries import _R09_WINDOW

        return list(_R09_WINDOW)
    if source == "windows_historical":
        from etl_python_azure_spark.queries import (
            _R04_WINDOW,
            _R05_WINDOW,
            _R06_WINDOW,
            _R10_WINDOW,
            _R11_WINDOW,
        )

        return [
            *_R04_WINDOW, *_R05_WINDOW, *_R06_WINDOW, *_R10_WINDOW,
            *_R11_WINDOW,
        ]
    if source == "artifact_consumers":
        from etl_python_azure_spark.queries._artifacts import (
            artifact_consumers,
        )

        return sorted(artifact_consumers())
    raise ValueError(source)


@pytest.mark.parametrize(
    "source",
    ["bench", "plan_audit", "window_r09", "windows_historical",
     "artifact_consumers"],
)
def test_registry_coupled_lists_resolve(source):
    """Every query name any registry-coupled list mentions — the
    bench lists, the plan-audit list, the driver windows (current
    and historical), the train-once artifact consumer sets — must
    resolve in the registry, and each list must be non-empty.
    A typo would silently shrink the bench (names are filtered with
    `if q in reg`), skip prewarm for a real consumer (bench re-times
    training), crash the plan audit, or burn a driver window slot on
    a nonexistent query. One parametrized helper so a future list
    gets one new parameter, not a hand-rolled test that can go
    vacuous (r06 verdict item 7)."""
    from etl_python_azure_spark.queries import registry

    # registry() FIRST: it imports the query modules that populate
    # the consumer sets — reversed order passes vacuously on an
    # empty set when this test runs standalone.
    reg = set(registry())
    assert reg, "registry is empty"
    names = _coupled_names(source)
    assert names, f"{source} list is empty"
    missing = [n for n in names if n not in reg]
    assert not missing, f"{source} names not in registry: {missing}"
