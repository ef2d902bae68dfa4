"""Guards on the round-driver contract (__spark_entry__ + bench)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

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
    from etl_python_azure_spark.queries import _R09_WINDOW, registry

    reg = registry()
    assert len(_R09_WINDOW) == 50
    assert len(set(_R09_WINDOW)) == 50
    assert all(n in reg for n in _R09_WINDOW)
    assert list(reg)[:50] == _R09_WINDOW
    assert all(spec.oracle is not None for spec in reg.values())
    # r09 mandate (r06/r07/r08 verdicts, item 1): slots 1-3 re-prove
    # the IVF-path queries whose plans changed after the r06 window
    # froze; slots 4-11 are the eight round-6b queries that have
    # never had a driver correctness row
    ivf_reproofs = [
        "ann_ivf_recall", "ann_ivfpq_recall", "ann_ivf_kmeans_recall",
    ]
    round6b = [
        "semdedup_cluster_pairs", "ivf_probe_recall_sweep",
        "heavy_hitter_tokens", "readability_by_source",
        "cusum_value_changepoints", "lsh_band_sweep",
        "semdedup_recall_audit", "ann_ivf_incremental",
    ]
    new_r09 = ["url_domain_dedup_health", "cross_doc_dup_spans"]
    assert _R09_WINDOW[:3] == ivf_reproofs
    assert _R09_WINDOW[3:11] == round6b
    assert _R09_WINDOW[11:13] == new_r09


def test_bench_and_plan_audit_names_resolve():
    """Every query name bench.py times and dump_plans.py audits must
    exist in the registry — a typo would silently shrink the bench
    (names are filtered with `if q in reg`) or crash the audit."""
    import importlib.util
    import os
    import sys

    from etl_python_azure_spark.queries import registry

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    reg = registry()

    def _names(path, attrs):
        spec = importlib.util.spec_from_file_location("m_", path)
        mod = importlib.util.module_from_spec(spec)
        # the modules import nothing at top level that needs Spark
        sys.modules["m_"] = mod
        spec.loader.exec_module(mod)
        out = []
        for a in attrs:
            out += getattr(mod, a)
        return out

    bench_names = _names(
        os.path.join(root, "bench.py"), ["HEADLINE", "OPTIONAL"]
    )
    missing = [n for n in bench_names if n not in reg]
    assert not missing, f"bench.py names not in registry: {missing}"
    plan_names = _names(
        os.path.join(root, "scripts", "dump_plans.py"), ["QUERIES"]
    )
    missing = [n for n in plan_names if n not in reg]
    assert not missing, f"dump_plans.py names not in registry: {missing}"


def test_artifact_consumer_names_resolve():
    """Every query name registered as a train-once artifact consumer
    must exist in the registry — a typo would silently skip prewarm
    for a real consumer (bench re-times training) or annotate a
    nonexistent query in the plan audit."""
    from etl_python_azure_spark.queries import registry
    from etl_python_azure_spark.queries._artifacts import (
        artifact_consumers,
    )

    # registry() first: it imports the query modules that populate
    # the consumer set — the reverse order passes vacuously on an
    # empty set when this test runs standalone.
    reg = set(registry())
    consumers = artifact_consumers()
    assert consumers, "artifact consumer set is empty"
    missing = consumers - reg
    assert not missing, missing
