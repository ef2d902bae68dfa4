"""Round-6b surface: SemDeDup clustered dedup, IVF nprobe sweep,
CMS heavy hitters, Flesch readability, CUSUM changepoints."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE


# ------------------------------------------------------- SemDeDup
def test_semdedup_finds_duplicate_vectors_in_same_cell(spark):
    from etl_python_azure_spark.operators.similarity import (
        kmeans_centroids,
        semdedup_pairs,
    )

    # two identical vectors (near-dups by construction), plus spread
    # fillers far from them and from each other
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 0.0, 1.0]),
        (5, [0.0, 0.7, 0.7, 0.0]),
    ]
    em = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_centroids(em, num_centroids=3, max_iter=4, tol=0.0)
    out = semdedup_pairs(em, cents, threshold=0.99).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(0, 1)]
    assert out[0].cosine == pytest.approx(1.0)


def test_semdedup_is_subset_of_bruteforce(spark):
    """Cell restriction can only REMOVE pairs relative to the
    brute-force verifier, never add or rescore them."""
    from etl_python_azure_spark.operators.dedup import (
        embedding_cosine_pairs,
    )
    from etl_python_azure_spark.operators.similarity import (
        kmeans_centroids,
        semdedup_pairs,
    )
    from etl_python_azure_spark.session import load_tables

    em = load_tables(spark, SF_SMOKE, "embeddings")
    cents = kmeans_centroids(em, num_centroids=16, max_iter=6, tol=0.0)
    sem = {
        (r.id_a, r.id_b): r.cosine
        for r in semdedup_pairs(em, cents, threshold=0.46).collect()
    }
    brute = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_cosine_pairs(em, threshold=0.46).collect()
    }
    assert set(sem) <= set(brute)
    for k, v in sem.items():
        assert v == brute[k]  # bit-identical cosine, same fold


# ------------------------------------------------- CMS heavy hitters
def test_cms_heavy_hitters_finds_all_true_heavy_tokens(spark):
    from etl_python_azure_spark.operators.aggregates import (
        cms_heavy_hitters,
    )

    # 100 tokens total: 'a' x50, 'b' x30, 20 singletons
    toks = ["a"] * 50 + ["b"] * 30 + [f"t{i}" for i in range(20)]
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    out = {r.token: r for r in cms_heavy_hitters(df, phi=0.2).collect()}
    # CMS never under-counts: every true heavy hitter is a candidate
    assert {"a", "b"} <= set(out)
    assert out["a"].is_true_hh and out["b"].is_true_hh
    for r in out.values():
        assert r.cms_estimate >= r.exact_count
        assert r.hh_threshold == 20
        # any extra candidate must be a sketch false positive
        if r.token not in ("a", "b"):
            assert not r.is_true_hh


# ------------------------------------------------------ readability
def test_flesch_known_sentence(spark):
    from etl_python_azure_spark.operators.text import flesch_reading_ease

    df = spark.createDataFrame(
        [(1, "The cat sat.")], "doc_id long, text string"
    )
    r = flesch_reading_ease(df).collect()[0]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (3, 1, 3)
    assert r.flesch == pytest.approx(206.835 - 1.015 * 3.0 - 84.6 * 1.0)


def test_flesch_drops_empty_and_floors_sentences(spark):
    from etl_python_azure_spark.operators.text import flesch_reading_ease

    df = spark.createDataFrame(
        [(1, ""), (2, "no terminal punctuation here")],
        "doc_id long, text string",
    )
    rows = flesch_reading_ease(df).collect()
    # doc 1 has one empty 'word' from split('') -> size 1? No: split of
    # '' on ' ' yields [''], one element, but 0-length tokens still
    # count as words here; the w>0 gate only drops degenerate rows
    by_id = {r.doc_id: r for r in rows}
    assert by_id[2].n_sentences == 1  # floored, no division by zero


# ------------------------------------------------------------ CUSUM
def test_cusum_level_shift_recovered(spark):
    from etl_python_azure_spark.operators.timeseries import (
        cusum_changepoint,
    )

    base = datetime.date(2024, 1, 1)
    rows = [
        ("x", base + datetime.timedelta(days=i), 0.0 if i < 5 else 10.0)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, day date, v double")
    r = cusum_changepoint(df, "g", "day", "v").collect()[0]
    assert r.n_points == 10
    assert r.cp_time == base + datetime.timedelta(days=4)  # last pre-shift
    assert r.cusum_at_cp == pytest.approx(-25.0)
    assert r.mean_before == pytest.approx(0.0)
    assert r.mean_after == pytest.approx(10.0)


def test_cusum_flat_series_picks_first_point(spark):
    from etl_python_azure_spark.operators.timeseries import (
        cusum_changepoint,
    )

    base = datetime.date(2024, 1, 1)
    rows = [("x", base + datetime.timedelta(days=i), 3.5) for i in range(6)]
    df = spark.createDataFrame(rows, "g string, day date, v double")
    r = cusum_changepoint(df, "g", "day", "v").collect()[0]
    # every S_t is 0 -> earliest-day tiebreak
    assert r.cp_time == base
    assert r.cusum_at_cp == pytest.approx(0.0)
    assert r.mean_after == pytest.approx(3.5)


# ------------------------------------------------------- IVF sweep
def test_ivf_recall_sweep_monotone(spark):
    from etl_python_azure_spark.queries.round6b import (
        ivf_probe_recall_sweep,
    )

    rows = {
        r.nprobe: r for r in ivf_probe_recall_sweep(spark, SF_SMOKE).collect()
    }
    assert sorted(rows) == [1, 2, 4, 8]
    rec = [rows[p].recall_at_5 for p in (1, 2, 4, 8)]
    assert all(b >= a for a, b in zip(rec, rec[1:]))  # monotone in nprobe
    assert all(0.0 <= x <= 1.0 for x in rec)
    for r in rows.values():
        assert r.n_hits == pytest.approx(r.recall_at_5 * 50.0)


# --------------------------------------------------- LSH band sweep
def test_lsh_band_sweep_tradeoff(spark):
    """More rows per band => fewer false-positive candidates at low
    J; identical docs are detected by every banding."""
    from etl_python_azure_spark.operators.dedup import lsh_band_sweep

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # J = 1
        (3, "alpha beta gamma completely different tail here now"),
        (4, "unrelated words that share nothing with the others x"),
        (5, "another disjoint document full of its own vocabulary y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = lsh_band_sweep(df, "doc_id", "text", j_floor=0.0).collect()
    by_cfg = {}
    for r in out:
        by_cfg.setdefault((r.bands, r.rows_per_band), {})[r.j_bin5] = r
    for cfg, bins in by_cfg.items():
        top = bins[max(bins)]
        assert top.detect_rate == 1.0  # the identical pair always found
    for r in out:
        assert 0.0 <= r.mean_theory_detect <= 1.0
        assert r.n_detected <= r.n_pairs


def test_mult_chain_matches_pow(spark):
    import math

    from etl_python_azure_spark.operators.dedup import _mult_chain

    df = spark.createDataFrame([(0.37,)], "x double")
    got = df.select(
        *[_mult_chain(F.col("x"), p).alias(f"p{p}") for p in (1, 2, 4, 8)]
    ).collect()[0]
    assert got.p1 == 0.37
    assert got.p2 == 0.37 * 0.37
    assert got.p4 == (0.37 * 0.37) * (0.37 * 0.37)
    assert math.isclose(got.p8, 0.37**8, rel_tol=1e-12)


# --------------------------------------- SemDeDup recall audit
def test_semdedup_recall_audit_counts(spark):
    from etl_python_azure_spark.queries.round6b import (
        semdedup_recall_audit,
    )

    rows = semdedup_recall_audit(spark, SF_SMOKE).collect()
    assert rows  # brute pairs exist at sf0.001
    for r in rows:
        assert 0 <= r.n_detected <= r.n_pairs
        assert r.detect_rate == pytest.approx(r.n_detected / r.n_pairs)


# --------------------------------------- incremental IVF index
def test_incremental_index_equals_batch_rebuild(spark):
    """Union of per-batch ivf_assign outputs against a FROZEN
    quantizer must search identically to assigning the combined
    corpus in one pass — the maintenance path adds nothing and
    loses nothing."""
    from etl_python_azure_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
        ivf_topk_from_index,
    )
    from etl_python_azure_spark.session import load_tables

    em = load_tables(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    off = em.agg(F.max("vec_id")).first()[0] + 1
    delta = em.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + F.lit(off)).alias("vec_id"), "embedding"
    )
    cents = ivf_centroids(em, num_centroids=16)
    q = em.filter(F.col("vec_id") < 5)
    inc = ivf_assign(em, cents).unionByName(ivf_assign(delta, cents))
    batch = ivf_assign(em.unionByName(delta), cents)
    r_inc = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in ivf_topk_from_index(inc, q, cents).collect()
    )
    r_batch = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in ivf_topk_from_index(batch, q, cents).collect()
    )
    assert r_inc == r_batch
    assert r_inc  # non-degenerate
