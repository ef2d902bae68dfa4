"""Property-based tests (hypothesis) for the round-4 operator
algebra: SCD2 compaction, snapshot diff, and PageRank invariants
that must hold for ANY input, not just the fixture cases."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_python_azure_spark.operators.graph import pagerank
from etl_python_azure_spark.operators.joins import snapshot_diff
from etl_python_azure_spark.operators.timeseries import scd2_compact
from etl_python_azure_spark.session import get_spark

BASE = datetime.datetime(2024, 1, 1)

obs_row = st.tuples(
    st.integers(0, 2),          # key
    st.integers(0, 5),          # day offset (ties allowed via key dup)
    st.sampled_from(["a", "b", None]),  # attr
)
obs_set = st.lists(obs_row, min_size=1, max_size=10)

_slow = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _obs_df(rows):
    spark = get_spark("prop4")
    data = [
        (k, BASE + datetime.timedelta(days=d), i, a)
        for i, (k, d, a) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "k long, ts timestamp, tb long, attr string"
    )


@_slow
@given(obs_set)
def test_scd2_partitions_observations_exactly(rows):
    """Versions per key form 1..n; n_obs sums to the observation
    count; consecutive versions never share an attr value (null-safe);
    valid_to chains equal the next version's valid_from."""
    df = _obs_df(rows)
    out = scd2_compact(df, "k", "ts", ["attr"], "tb").collect()
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    total_obs = 0
    for k, vs in by_key.items():
        vs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in vs] == list(range(1, len(vs) + 1))
        for prev, cur in zip(vs, vs[1:]):
            assert prev["attr"] != cur["attr"] or (
                (prev["attr"] is None) != (cur["attr"] is None)
            )
            assert prev["valid_to"] == cur["valid_from"]
        assert vs[-1]["valid_to"] is None
        total_obs += sum(r["n_obs"] for r in vs)
    assert total_obs == len(rows)


snap_row = st.tuples(st.integers(0, 6), st.integers(0, 2))
snap_set = st.lists(snap_row, min_size=0, max_size=8,
                    unique_by=lambda r: r[0])


@_slow
@given(snap_set, snap_set)
def test_snapshot_diff_reconstructs_membership(old_rows, new_rows):
    """added/removed/changed exactly mirror set membership and value
    drift; unchanged rows never appear."""
    spark = get_spark("prop4")
    schema = "k long, v long"
    old = spark.createDataFrame(old_rows, schema) if old_rows else (
        spark.createDataFrame([], schema)
    )
    new = spark.createDataFrame(new_rows, schema) if new_rows else (
        spark.createDataFrame([], schema)
    )
    out = {r["k"]: r["change_type"]
           for r in snapshot_diff(old, new, "k").collect()}
    om, nm = dict(old_rows), dict(new_rows)
    for k in set(om) | set(nm):
        if k not in om:
            assert out[k] == "added"
        elif k not in nm:
            assert out[k] == "removed"
        elif om[k] != nm[k]:
            assert out[k] == "changed"
        else:
            assert k not in out


edge = st.tuples(st.integers(1, 4), st.integers(1, 4), st.integers(1, 5))
edge_set = st.lists(edge, min_size=1, max_size=8,
                    unique_by=lambda e: (e[0], e[1]))


@_slow
@given(edge_set)
def test_pagerank_mass_and_floor_invariants(edges):
    """Ranks are each ≥ (1-d)/N; total mass never exceeds 1 + eps
    (floor-quantization only leaks mass DOWN, dangling nodes leak it
    away); every node appears exactly once."""
    spark = get_spark("prop4")
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    out = pagerank(e, weight_col="w", n_iter=3).collect()
    nodes = {r["node"] for r in out}
    assert len(out) == len(nodes)
    n = len(nodes)
    floor_rank = (1.0 - 0.85) / n
    for r in out:
        assert r["rank"] >= floor_rank - 1e-12
    assert sum(r["rank"] for r in out) <= 1.0 + 1e-9
