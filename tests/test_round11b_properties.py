"""Property-based tests (hypothesis) for the round-11b operators.

Small randomized domains force hash collisions and boundary cases a
fixed fixture misses:

- span_removal: every output equals a brute-force Python rewrite
  (owner keeps, non-owners lose the union of covered positions).
- binned_overlap_pairs: the binned join equals the brute-force pair
  enumeration for ANY bin width, including widths larger than every
  interval.
- ranked_cumsum: ranks/cumsums equal the single-pass computation for
  any score multiset (ties included), under both bucketing modes.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_python_azure_spark.session import get_spark

# --------------------------------------------------------------------------
# span_removal ≡ brute force.
# --------------------------------------------------------------------------

W = 3  # small window so tiny docs collide

# docs over a 4-letter alphabet, 0..9 tokens each — collisions are
# the norm, not the exception
doc = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=9
)
corpus = st.lists(doc, min_size=1, max_size=6)


def _brute_span_removal(texts: list[list[str]], w: int):
    spans: dict[tuple[str, ...], list[int]] = {}
    for i, toks in enumerate(texts):
        for p in range(len(toks) - w + 1):
            spans.setdefault(tuple(toks[p : p + w]), []).append(i)
    owner = {
        s: min(docs) for s, docs in spans.items() if len(set(docs)) >= 2
    }
    out = {}
    for i, toks in enumerate(texts):
        removed = set()
        for p in range(len(toks) - w + 1):
            s = tuple(toks[p : p + w])
            if s in owner and owner[s] != i:
                removed.update(range(p, p + w))
        kept = [t for j, t in enumerate(toks) if j not in removed]
        out[i] = (len(toks), len(kept), " ".join(kept))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=corpus)
def test_span_removal_equals_bruteforce(texts):
    from etl_python_azure_spark.operators.dedup import span_removal

    spark = get_spark("props-r11b")
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["kept_tokens"], r["rewritten_text"])
        for r in span_removal(df, "doc_id", "text", window=W).collect()
    }
    # whitespace split of "" is [''], one token — mirror that in the
    # brute force (the operator's alphabet, not ours)
    norm = [t if t else [""] for t in texts]
    assert got == _brute_span_removal(norm, W)


# --------------------------------------------------------------------------
# binned_overlap_pairs ≡ brute force for any bin width.
# --------------------------------------------------------------------------

EPOCH = datetime.date(1995, 1, 1)

iv = st.tuples(
    st.integers(0, 2),  # group
    st.integers(0, 40),  # start day
    st.integers(0, 12),  # length
)
ivset = st.lists(iv, min_size=0, max_size=10)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=ivset, bin_days=st.sampled_from([1, 7, 100]))
def test_binned_overlap_pairs_equals_bruteforce(rows, bin_days):
    from etl_python_azure_spark.operators.intervals import (
        binned_overlap_pairs,
    )

    spark = get_spark("props-r11b")
    data = [
        (
            g,
            i,
            EPOCH + datetime.timedelta(days=s),
            EPOCH + datetime.timedelta(days=s + ln),
        )
        for i, (g, s, ln) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data or [(0, 0, EPOCH, EPOCH)], "grp long, item long, s date, e date"
    ).limit(len(data))
    expected = set()
    for ga, ia, sa, ea in data:
        for gb, ib, sb, eb in data:
            if ga == gb and ia < ib and sa <= eb and sb <= ea:
                ov = (min(ea, eb) - max(sa, sb)).days + 1
                expected.add((ga, ia, ib, ov))
    got = {
        (r["grp"], r["item_a"], r["item_b"], r["overlap_days"])
        for r in binned_overlap_pairs(
            df,
            key_cols=["grp"],
            start_col="s",
            end_col="e",
            payload_cols=["item"],
            bin_days=bin_days,
            distinct_on="item",
        ).collect()
    }
    assert got == expected


# --------------------------------------------------------------------------
# ranked_cumsum ≡ single pass, ties included, both bucket modes.
# --------------------------------------------------------------------------

wrow = st.tuples(
    st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.5, 0.9, 1.0]),  # dup-heavy
    st.integers(1, 20),
)
wrows = st.lists(wrow, min_size=1, max_size=12)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=wrows, equalize=st.booleans())
def test_ranked_cumsum_equals_single_pass(rows, equalize):
    from etl_python_azure_spark.operators.sampling import ranked_cumsum

    spark = get_spark("props-r11b")
    data = [(i, s, w) for i, (s, w) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, score double, w long")
    order = sorted(data, key=lambda r: (-r[1], r[0]))
    cum, expected = 0, {}
    for rank, (i, _s, w) in enumerate(order, start=1):
        cum += w
        expected[i] = (rank, cum)
    got = {
        r["doc_id"]: (r["rank"], r["cum_weight"])
        for r in ranked_cumsum(
            df, "doc_id", "score", "w", score_buckets=4, equalize=equalize
        ).collect()
    }
    assert got == expected
