"""Differential properties for the round-5 operators: each is
checked against an independent brute-force Python implementation on
randomized (seeded) inputs — the same oracle discipline as the
DuckDB gate, but engine-free."""

from __future__ import annotations

import math
import random


def test_roc_auc_matches_pair_counting(spark):
    """AUC = (#(s⁺>s⁻) + ½·#(s⁺=s⁻)) / (P·N) — the rank-sum form
    must equal direct pair counting, including heavy ties."""
    from etl_python_azure_spark.operators.features import roc_auc_exact

    rng = random.Random(11)
    rows = [
        ("g%d" % (i % 3), float(rng.randrange(6)), rng.randrange(2))
        for i in range(240)
    ]
    got = {
        r["g"]: r["auc"]
        for r in roc_auc_exact(
            spark.createDataFrame(rows, "g string, s double, y int"),
            "g", "s", "y",
        ).collect()
    }
    for g in ("g0", "g1", "g2"):
        pos = [s for gg, s, y in rows if gg == g and y == 1]
        neg = [s for gg, s, y in rows if gg == g and y == 0]
        num = sum(
            1.0 if p > n else 0.5 if p == n else 0.0
            for p in pos for n in neg
        )
        assert abs(got[g] - num / (len(pos) * len(neg))) < 1e-12


def test_containment_matches_set_math(spark):
    from etl_python_azure_spark.operators.dedup import containment_pairs

    rng = random.Random(23)
    vocab = ["w%d" % i for i in range(12)]
    docs = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 25)))
        for i in range(30)
    }
    out = containment_pairs(
        spark.createDataFrame(
            list(docs.items()), "id long, text string"
        ),
        "id", "text", n=3, threshold=0.5,
    ).collect()

    def sh(t):
        w = t.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    expected = {}
    for a in docs:
        for b in docs:
            if a >= b:
                continue
            inter = len(sh(docs[a]) & sh(docs[b]))
            ca = inter / len(sh(docs[a]))
            cb = inter / len(sh(docs[b]))
            if max(ca, cb) >= 0.5:
                expected[(a, b)] = (inter, ca, cb)
    got = {(r["id_a"], r["id_b"]): r for r in out}
    assert set(got) == set(expected)
    for k, (inter, ca, cb) in expected.items():
        assert got[k]["n_inter"] == inter
        assert abs(got[k]["containment_a_in_b"] - ca) < 1e-12
        assert abs(got[k]["containment_b_in_a"] - cb) < 1e-12


def test_adamic_adar_matches_bruteforce(spark):
    from etl_python_azure_spark.operators.graph import adamic_adar_links

    rng = random.Random(5)
    nodes = list(range(12))
    edges = sorted(
        {
            (a, b)
            for a in nodes for b in nodes
            if a < b and rng.random() < 0.3
        }
    )
    out = adamic_adar_links(
        spark.createDataFrame(edges, "src long, dst long"), k=1000
    ).collect()

    nbrs = {n: set() for n in nodes}
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    expected = {}
    for a in nodes:
        for b in nodes:
            if a >= b or (a, b) in set(edges):
                continue
            common = nbrs[a] & nbrs[b]
            if not common:
                continue
            score = sum(
                math.floor(1e8 / math.log(len(nbrs[w]))) for w in common
            ) / 1e8
            expected[(a, b)] = (len(common), score)
    got = {(r["node_u"], r["node_v"]): r for r in out}
    assert set(got) == set(expected)
    for k, (nc, sc) in expected.items():
        assert got[k]["n_common"] == nc
        assert got[k]["aa_score"] == sc
    # ranks: descending score, ties by (u, v)
    order = sorted(
        expected, key=lambda k: (-expected[k][1], k[0], k[1])
    )
    assert [
        (r["node_u"], r["node_v"])
        for r in sorted(out, key=lambda r: r["rank"])
    ] == order


def test_seasonal_mase_matches_bruteforce(spark):
    from etl_python_azure_spark.operators.timeseries import seasonal_mase

    rng = random.Random(31)
    series = [round(rng.uniform(0, 50), 3) for _ in range(40)]
    rows = [("g", d, v) for d, v in enumerate(series)]
    r = seasonal_mase(
        spark.createDataFrame(rows, "g string, day int, v double"),
        "g", "day", "v", season_lag=7,
    ).collect()[0]

    qs = [
        math.floor(abs(series[d] - series[d - 7]) * 1e8)
        for d in range(7, 40)
    ]
    qn = [
        math.floor(abs(series[d] - series[d - 1]) * 1e8)
        for d in range(7, 40)
    ]
    n = 33
    assert r["n_scored_days"] == n
    assert r["seasonal_mae"] == (sum(qs) / 1e8) / n
    assert r["naive_mae"] == (sum(qn) / 1e8) / n
    assert r["mase"] == (sum(qs) / 1e8) / (sum(qn) / 1e8)


def test_mmr_matches_bruteforce_greedy(spark):
    """The DataFrame greedy loop must reproduce a plain-Python greedy
    over the same IEEE arithmetic (index-ordered dots, identical
    formula order)."""
    from etl_python_azure_spark.operators.similarity import mmr_topk

    rng = random.Random(41)
    dim = 64
    vecs = {
        i: [rng.uniform(-1, 1) for _ in range(dim)] for i in range(25)
    }
    em = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    out = (
        mmr_topk(em, query_id=0, n_candidates=8, k=4, lam=0.7)
        .orderBy("rank")
        .collect()
    )

    # float32 storage: replicate Spark's cast by round-tripping
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    v32 = {i: [f32(x) for x in v] for i, v in vecs.items()}

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y  # left-to-right float64, like F.aggregate
        return acc

    def norm(a):
        return math.sqrt(dot(a, a))

    def cos(a, b):
        return dot(v32[a], v32[b]) / (norm(v32[a]) * norm(v32[b]))

    rel = {c: cos(0, c) for c in v32 if c != 0}
    cand = sorted(rel, key=lambda c: (-rel[c], c))[:8]
    sel = [min(cand, key=lambda c: (-rel[c], c))]
    for _ in range(3):
        rest = [c for c in cand if c not in sel]
        scores = {
            c: 0.7 * rel[c] - 0.3 * max(cos(c, s) for s in sel)
            for c in rest
        }
        sel.append(min(rest, key=lambda c: (-scores[c], c)))
    assert [r["vec_id"] for r in out] == sel
