"""Property-based tests (hypothesis) for the CDC/merge algebra.

Invariants of SURVEY §2.9 T4 that must hold for ANY (incoming,
existing) pair, not just the fixture cases:

- new ∪ updated ⊆ incoming, and they are disjoint on the key
- equal-or-older versions appear in neither half (strict ``>``)
- merge post-image: one row per key; every key from both inputs
  survives; the surviving version is the max eligible one
- merge is idempotent: merging the same incoming twice is a no-op
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_python_azure_spark.operators.joins import cdc_split, merge_upsert
from etl_python_azure_spark.session import get_spark

BASE = datetime.datetime(2024, 1, 1)

# (key, version-offset-days) pairs; small domains force collisions
row = st.tuples(st.integers(0, 5), st.integers(0, 3))
rowset = st.lists(row, min_size=0, max_size=8, unique_by=lambda r: r)


def _df(rows):
    spark = get_spark("props")
    data = [
        (k, BASE + datetime.timedelta(days=v), f"{k}:{v}") for k, v in rows
    ]
    return spark.createDataFrame(
        data or [(0, BASE, "sentinel")], "id long, updated_at timestamp, v string"
    ).limit(len(data))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(incoming=rowset, existing=rowset)
def test_cdc_split_invariants(incoming, existing):
    # one version per key on the existing side (it's a keyed table)
    existing = list({k: (k, v) for k, v in existing}.values())
    inc_df, ex_df = _df(incoming), _df(existing)
    split = cdc_split(inc_df, ex_df)
    new = {(r.id, r.updated_at) for r in split.new.collect()}
    upd = {(r.id, r.updated_at) for r in split.updated.collect()}
    inc = {(k, BASE + datetime.timedelta(days=v)) for k, v in incoming}
    ex = {k: BASE + datetime.timedelta(days=v) for k, v in existing}

    assert new <= inc and upd <= inc
    assert {k for k, _ in new}.isdisjoint({k for k, _ in upd})
    for k, ts in new:
        assert k not in ex
    for k, ts in upd:
        assert k in ex and ts > ex[k]
    # strictness: equal/older rows land nowhere
    dropped = inc - new - upd
    for k, ts in dropped:
        assert k in ex and ts <= ex[k]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(incoming=rowset, existing=rowset)
def test_merge_upsert_post_image(incoming, existing):
    # keyed sides: one version per key
    incoming = list({k: (k, v) for k, v in incoming}.values())
    existing = list({k: (k, v) for k, v in existing}.values())
    inc_df, ex_df = _df(incoming), _df(existing)
    merged = merge_upsert(inc_df, ex_df)
    got = {r.id: r.updated_at for r in merged.collect()}

    inc = {k: BASE + datetime.timedelta(days=v) for k, v in incoming}
    ex = {k: BASE + datetime.timedelta(days=v) for k, v in existing}
    # one row per key; all keys survive
    assert set(got) == set(inc) | set(ex)
    assert merged.count() == len(got)
    for k, ts in got.items():
        if k in inc and k in ex:
            assert ts == (inc[k] if inc[k] > ex[k] else ex[k])
        else:
            assert ts == (inc.get(k) or ex[k])

    # idempotence: applying the same incoming again changes nothing
    again = merge_upsert(inc_df, merged)
    got2 = {r.id: r.updated_at for r in again.collect()}
    assert got2 == got


# ---------------------------------------------------------------------------
# bucketized range join: the bucketing is an implementation detail —
# results must be EXACTLY the naive θ-join's, for any bucket width
# ---------------------------------------------------------------------------
point = st.integers(0, 30)
interval = st.tuples(st.integers(0, 30), st.integers(0, 12))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    points=st.lists(point, min_size=0, max_size=10),
    intervals=st.lists(interval, min_size=0, max_size=6),
    width=st.sampled_from([1.0, 2.5, 7.0, 100.0]),
)
def test_range_join_invariant_to_bucket_width(points, intervals, width):
    from etl_python_azure_spark.operators.range_join import bucketed_range_join

    spark = get_spark("props")
    left = spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate(points)] or [(0, 0.0)],
        "lid long, p double",
    ).limit(len(points))
    right = spark.createDataFrame(
        [(100 + i, float(s), float(s + d)) for i, (s, d) in enumerate(intervals)]
        or [(0, 0.0, 0.0)],
        "rid long, s double, e double",
    ).limit(len(intervals))
    got = {
        (r.lid, r.rid)
        for r in bucketed_range_join(
            left, right, "p", "s", "e", bucket_width=width
        ).collect()
    }
    expect = {
        (i, 100 + j)
        for i, p in enumerate(points)
        for j, (s, d) in enumerate(intervals)
        if s <= p < s + d
    }
    assert got == expect
