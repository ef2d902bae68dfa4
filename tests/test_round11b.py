"""Round-11b wave: span removal, interval overlap join, distributed
ranked cumsum, truncation recall, semantic decontamination.

Differential style: every operator is checked against a brute-force
Python twin on fixtures small enough to enumerate, plus the
invariance that makes the distributed formulation trustworthy
(bin-width / bucket-count knobs must not change results).
"""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# span_removal: the rewrite transform.
# --------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string"
    )


def test_span_removal_excises_non_owner_copies(spark):
    """The min-id holder keeps the duplicated span; every other doc
    loses exactly the covered positions; token arithmetic adds up."""
    from etl_python_azure_spark.operators.dedup import span_removal

    span = "a b c d e f g h"  # exactly one 8-token window
    d1 = f"{span} unique tail one"
    d2 = f"start words {span} end"
    d3 = "totally different words with no duplicate content here"
    out = {
        r["doc_id"]: r
        for r in span_removal(
            _docs(spark, [(1, d1), (2, d2), (3, d3)]),
            "doc_id",
            "text",
            window=8,
        ).collect()
    }
    # owner (min id) keeps everything
    assert out[1]["rewritten_text"] == d1
    assert out[1]["removed_tokens"] == 0
    # non-owner loses the 8 covered tokens, order preserved
    assert out[2]["rewritten_text"] == "start words end"
    assert out[2]["removed_tokens"] == 8
    assert out[2]["kept_tokens"] == 3
    assert out[2]["n_tokens"] == 11
    # dup-free doc passes through
    assert out[3]["rewritten_text"] == d3
    assert out[3]["removed_tokens"] == 0


def test_span_removal_merges_chained_windows(spark):
    """A shared run longer than the window removes the UNION of its
    overlapping windows (islands), not window-count tokens."""
    from etl_python_azure_spark.operators.dedup import span_removal

    run = " ".join(f"t{i}" for i in range(12))  # 5 dup windows, 12 tokens
    out = {
        r["doc_id"]: r
        for r in span_removal(
            _docs(spark, [(1, run), (2, f"pre {run} post")]),
            "doc_id",
            "text",
            window=8,
        ).collect()
    }
    assert out[2]["removed_tokens"] == 12
    assert out[2]["rewritten_text"] == "pre post"


def test_span_removal_short_docs_pass_through(spark):
    from etl_python_azure_spark.operators.dedup import span_removal

    out = span_removal(
        _docs(spark, [(1, "too short"), (2, "too short")]),
        "doc_id",
        "text",
        window=8,
    ).collect()
    assert all(r["removed_tokens"] == 0 for r in out)
    assert all(r["rewritten_text"] == "too short" for r in out)


# --------------------------------------------------------------------------
# binned_overlap_pairs: differential + bin-width invariance.
# --------------------------------------------------------------------------


def test_binned_overlap_pairs_matches_bruteforce(spark):
    rng = random.Random(11)
    epoch = dt.date(1995, 1, 1)
    rows = []
    for i in range(60):
        s = epoch + dt.timedelta(days=rng.randrange(0, 120))
        e = s + dt.timedelta(days=rng.randrange(0, 25))
        rows.append((rng.randrange(0, 5), i, s, e))
    df = spark.createDataFrame(
        rows, "grp long, item long, s date, e date"
    )
    expected = set()
    for ga, ia, sa, ea in rows:
        for gb, ib, sb, eb in rows:
            if ga == gb and ia < ib and sa <= eb and sb <= ea:
                ov = (min(ea, eb) - max(sa, sb)).days + 1
                expected.add((ga, ia, ib, ov))

    from etl_python_azure_spark.operators.intervals import (
        binned_overlap_pairs,
    )

    for bin_days in (3, 30):
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
        assert got == expected, f"bin_days={bin_days}"


# --------------------------------------------------------------------------
# ranked_cumsum: differential + bucket-count invariance + plan shape.
# --------------------------------------------------------------------------


def test_ranked_cumsum_matches_single_pass(spark):
    rng = random.Random(7)
    rows = [
        (i, round(rng.random(), 3), rng.randrange(1, 50))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, w long")
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    cum, expected = 0, {}
    for rank, (i, s, w) in enumerate(order, start=1):
        cum += w
        expected[i] = (rank, cum)

    from etl_python_azure_spark.operators.sampling import ranked_cumsum

    for nb in (1, 64):
        got = {
            r["doc_id"]: (r["rank"], r["cum_weight"])
            for r in ranked_cumsum(
                df, "doc_id", "score", "w", score_buckets=nb
            ).collect()
        }
        assert got == expected, f"score_buckets={nb}"


def test_ranked_cumsum_plan_buckets_the_rank_window(spark, sf_dir):
    """The corpus-sized window partitions by the score bucket (the
    only unpartitioned windows are over the tiny bucket-offsets
    aggregate), and offsets come back via broadcast."""
    from etl_python_azure_spark.queries import registry

    df = registry()["token_budget_selection"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    specs = [
        seg.split(")")[0]
        for seg in plan.split("windowspecdefinition(")[1:]
    ]
    big = [s for s in specs if "score" in s]
    assert big, "expected the rank window over the quality score"
    assert all("__bkt" in s for s in big)


def test_curriculum_phases_are_balanced(spark, sf_dir):
    from etl_python_azure_spark.queries import registry

    rows = registry()["curriculum_phase_manifest"].builder(
        spark, sf_dir
    ).collect()
    per_phase = {}
    for r in rows:
        per_phase[r["phase"]] = per_phase.get(r["phase"], 0) + r["n_docs"]
    assert set(per_phase) == {1, 2, 3}
    assert max(per_phase.values()) - min(per_phase.values()) <= 1


# --------------------------------------------------------------------------
# truncated_cosine_topk / matryoshka.
# --------------------------------------------------------------------------


def test_truncated_topk_full_dim_equals_exact(spark, sf_dir):
    from etl_python_azure_spark.operators.similarity import (
        cosine_topk,
        truncated_cosine_topk,
    )
    from etl_python_azure_spark.session import load_tables

    em = load_tables(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(em, q, k=5).collect()
    }
    trunc = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in truncated_cosine_topk(em, q, 64, k=5).collect()
    }
    assert trunc == exact


def test_matryoshka_recall_monotone_anchor(spark, sf_dir):
    """The full-dim row is exactly 1.0 and every recall is a valid
    fraction of n_queries*k."""
    from etl_python_azure_spark.queries import registry

    rows = {
        r["trunc_dim"]: r
        for r in registry()["matryoshka_recall_sweep"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert rows[64]["recall"] == pytest.approx(1.0)
    for r in rows.values():
        hits = r["recall"] * r["n_queries"] * 5
        assert abs(hits - round(hits)) < 1e-9
        assert 0.0 <= r["recall"] <= 1.0


# --------------------------------------------------------------------------
# semantic_contamination.
# --------------------------------------------------------------------------


def test_semantic_contamination_flags_scaled_copy(spark):
    """A scaled copy of a reference vector (cosine exactly 1, same
    LSH bucket by construction) is flagged; its negation (cosine -1)
    is clean."""
    from etl_python_azure_spark.operators.similarity import (
        semantic_contamination,
    )

    ref_vec = [1.0, 0.5, -0.25, 2.0]
    rows = [
        (0, ref_vec),  # the reference itself
        (1, [2.0 * x for x in ref_vec]),  # scaled copy -> cos 1
        (2, [-x for x in ref_vec]),  # negation -> cos -1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r
        for r in semantic_contamination(
            df,
            df.filter(F.col("vec_id") == 0),
            threshold=0.9,
            dim=4,
        ).collect()
    }
    assert out[1]["is_contaminated"] == 1
    assert out[1]["max_cosine"] == pytest.approx(1.0)
    assert out[2]["is_contaminated"] == 0
    assert out[2]["max_cosine"] is None
    # the reference vector itself is excluded from matching itself
    assert out[0]["is_contaminated"] == 0


# --------------------------------------------------------------------------
# scoped vs global dedup: totals reconcile.
# --------------------------------------------------------------------------


def test_scoped_vs_global_dedup_reconciles(spark, sf_dir):
    from etl_python_azure_spark.queries import registry
    from etl_python_azure_spark.session import load_tables

    rows = registry()["scoped_vs_global_dedup"].builder(
        spark, sf_dir
    ).collect()
    d = load_tables(spark, sf_dir, "documents")
    n_global = d.select(F.md5("text")).distinct().count()
    assert sum(r["global_unique"] for r in rows) == n_global
    for r in rows:
        assert (
            r["cross_source_dups"]
            == r["local_unique"] - r["global_unique"]
        )
        assert r["local_unique"] <= r["n_docs"]


def test_ranked_cumsum_equalized_buckets_invariant(spark):
    """Equalized edges must not change ranks/cumsums even on a
    pathologically skewed score distribution (where the uniform
    grid would put ~everything in one bucket)."""
    rng = random.Random(3)
    rows = [
        (i, 0.5 + rng.random() * 1e-6, rng.randrange(1, 9))
        for i in range(70)
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, w long")
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    cum, expected = 0, {}
    for rank, (i, s, w) in enumerate(order, start=1):
        cum += w
        expected[i] = (rank, cum)

    from etl_python_azure_spark.operators.sampling import ranked_cumsum

    for eq in (False, True):
        got = {
            r["doc_id"]: (r["rank"], r["cum_weight"])
            for r in ranked_cumsum(
                df, "doc_id", "score", "w", score_buckets=8, equalize=eq
            ).collect()
        }
        assert got == expected, f"equalize={eq}"


# --------------------------------------------------------------------------
# DoReMi-style mixture weights + selection-signal agreement.
# --------------------------------------------------------------------------


def test_doremi_weights_normalized_and_quality_directed(spark, sf_dir):
    """Weights stay a (fixed-point) distribution after every
    normalization, and mass moves toward above-mean-quality domains
    (the multiplicative-weights direction)."""
    from etl_python_azure_spark.queries import registry

    rows = registry()["doremi_mixture_weights"].builder(
        spark, sf_dir
    ).collect()
    # truncating normalization can shave < n_domains ulps of 1e-9
    assert abs(sum(r["baseline_weight"] for r in rows) - 1.0) < 1e-6
    assert abs(sum(r["final_weight"] for r in rows) - 1.0) < 1e-6
    assert all(r["final_weight"] >= 0.0 for r in rows)
    # direction: at least one domain gains and one loses (the
    # excess signal is centered on the corpus mean)
    deltas = [r["weight_delta"] for r in rows]
    assert max(deltas) > 0 and min(deltas) < 0


def test_doremi_fixture_matches_hand_iteration(spark):
    """Two synthetic domains with a known quality gap reproduce the
    hand-run integer multiplicative-weights iteration."""
    from etl_python_azure_spark.queries import round11b  # noqa: F401
    from etl_python_azure_spark.queries import registry

    # build a tiny documents table: srcA all-alpha (score 1 before
    # the space), srcB digit-heavy (low alpha ratio)
    rows = []
    for i in range(10):
        rows.append((i, "aaaa bbbb cccc dddd", "en", "srcA", 19))
    for i in range(10, 20):
        rows.append((i, "1111 2222 3333 4444", "en", "srcB", 19))
    import os
    import tempfile

    tmp = tempfile.mkdtemp(prefix="doremi_fixture_")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {
        r["source"]: r
        for r in registry()["doremi_mixture_weights"]
        .builder(spark, tmp)
        .collect()
    }
    # equal token mass -> equal baseline; all the quality signal
    # favors srcA, so after 3 rounds srcA holds more weight
    assert out["srcA"]["baseline_weight"] == out["srcB"]["baseline_weight"]
    assert out["srcA"]["final_weight"] > out["srcB"]["final_weight"]


def test_dsir_vs_nb_agreement_cells_cover_corpus(spark, sf_dir):
    from etl_python_azure_spark.queries import registry
    from etl_python_azure_spark.session import load_tables

    rows = registry()["dsir_vs_nb_agreement"].builder(
        spark, sf_dir
    ).collect()
    total = load_tables(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total
    assert all(
        (r["dsir_keep"], r["nb_keep"]) in {(a, b) for a in (0, 1) for b in (0, 1)}
        for r in rows
    )


# --------------------------------------------------------------------------
# UniMax waterfilling + l-diversity.
# --------------------------------------------------------------------------


def test_unimax_budgets_waterfill_invariants(spark, sf_dir):
    """Allocations respect caps, never overspend the budget, leave
    less than one uncapped-language share unallocated, and at this
    budget/cap setting the small languages actually hit their
    caps while the head language absorbs the remainder."""
    from etl_python_azure_spark.queries import registry

    rows = registry()["unimax_language_budgets"].builder(
        spark, sf_dir
    ).collect()
    total = sum(r["n_tokens"] for r in rows)
    budget = total * 3 // 2
    spent = sum(r["alloc_tokens"] for r in rows)
    assert spent <= budget
    assert all(r["alloc_tokens"] <= r["cap_tokens"] for r in rows)
    n_open = sum(1 for r in rows if r["capped"] == 0)
    # convergence: leftover is only integer-division remainder
    assert budget - spent < max(n_open, 1) * 2
    assert any(r["capped"] == 1 for r in rows)
    assert any(r["capped"] == 0 for r in rows)
    # uncapped languages all get the same waterline share +- 1 round
    open_allocs = [r["alloc_tokens"] for r in rows if r["capped"] == 0]
    assert max(open_allocs) - min(open_allocs) <= len(rows)


def test_unimax_fixture_matches_hand_waterfill(spark):
    """3 languages, one tiny: the tiny language caps at 2 epochs and
    the rest split the remainder evenly."""
    import os
    import tempfile

    from etl_python_azure_spark.queries import registry

    rows = []
    did = 0
    for lang, n_docs in (("aa", 8), ("bb", 8), ("cc", 1)):
        for _ in range(n_docs):
            rows.append((did, "tok " * 9 + "tok", lang, "s", 39))
            did += 1
    tmp = tempfile.mkdtemp(prefix="unimax_fixture_")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {
        r["lang"]: r
        for r in registry()["unimax_language_budgets"]
        .builder(spark, tmp)
        .collect()
    }
    # tokens: aa=80, bb=80, cc=10; budget = floor(170*1.5) = 255
    # round 1: share 85 -> cc capped at 20; aa/bb take 85 each
    # round 2: r = 65... aa/bb keep absorbing until their cap (160)
    # or budget exhaustion: 255-20 = 235 split evenly = 117 each (+rem)
    assert out["cc"]["alloc_tokens"] == 20 and out["cc"]["capped"] == 1
    assert out["aa"]["alloc_tokens"] == out["bb"]["alloc_tokens"]
    spent = sum(r["alloc_tokens"] for r in out.values())
    assert 253 <= spent <= 255
    assert out["aa"]["capped"] == 0


def test_l_diversity_flags_homogeneous_groups(spark, sf_dir):
    """Every group's distinct_sensitive is <= group_size, the top
    share is a valid fraction, and the flag matches the count."""
    from etl_python_azure_spark.queries import registry

    rows = registry()["l_diversity_report"].builder(
        spark, sf_dir
    ).collect()
    for r in rows:
        assert 1 <= r["distinct_sensitive"] <= r["group_size"]
        assert 0.0 < r["top_sensitive_share"] <= 1.0
        assert r["l_diverse"] == (1 if r["distinct_sensitive"] >= 3 else 0)


def test_matryoshka_rerank_recall_vs_bruteforce(spark, sf_dir):
    """The two-stage retrieve-then-rerank tier recovers most of the
    exact full-dim top-5 (candidate recall bounds it; rerank ranks
    whatever the truncated tier surfaced in exact full-dim order)."""
    from etl_python_azure_spark.operators.similarity import (
        cosine_topk,
        matryoshka_ivf_rerank,
    )
    from etl_python_azure_spark.session import load_tables

    em = load_tables(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < 10)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(em, q, k=5).collect()
    }
    got_rows = matryoshka_ivf_rerank(
        em, q, trunc_dim=16, k=5, rerank_k=25
    ).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in got_rows}
    assert len(got_rows) == len(truth)
    recall = len(got & truth) / len(truth)
    # the comparative property (the absolute number is data-bound:
    # these synthetic embeddings are not MRL-trained, so the 16-dim
    # prefix carries limited signal): reranking a 25-candidate pool
    # with the exact metric must do at least as well as promoting
    # the truncated tier's own top-5 directly
    base_rows = matryoshka_ivf_rerank(
        em, q, trunc_dim=16, k=5, rerank_k=5
    ).collect()
    base = {(r["query_id"], r["neighbor_id"]) for r in base_rows}
    base_recall = len(base & truth) / len(truth)
    assert recall >= base_recall, (recall, base_recall)
    assert recall > 0.0
    assert all(1 <= r["rank"] <= 5 for r in got_rows)


def test_mask_manifest_consistent_with_rewrite(spark, sf_dir):
    """The mask intervals and the rewrite are two consumers of the
    same verdict: per doc, total masked tokens == removed tokens,
    and intervals are disjoint and ordered."""
    from etl_python_azure_spark.queries import registry

    masks = {}
    for r in registry()["dup_span_mask_manifest"].builder(
        spark, sf_dir
    ).collect():
        masks.setdefault(r["doc_id"], []).append(
            (r["mask_start"], r["mask_end"], r["mask_tokens"])
        )
    removed = {
        r["doc_id"]: r["removed_tokens"]
        for r in registry()["span_removal_rewrite"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert masks, "expected at least one duplicated span in testdata"
    for doc, spans in masks.items():
        spans.sort()
        assert sum(t for _s, _e, t in spans) == removed[doc]
        for (s1, e1, t1), (s2, _e2, _t2) in zip(spans, spans[1:]):
            assert e1 < s2  # disjoint (adjacent islands are legal)
            assert t1 == e1 - s1 + 1
