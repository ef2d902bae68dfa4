"""Differential properties for the round-6 operators: each checked
against an independent brute-force Python implementation on
randomized (seeded) inputs — the same oracle discipline as the
DuckDB gate, but engine-free."""

from __future__ import annotations

import datetime
import random
from collections import Counter


def test_cusum_matches_bruteforce(spark):
    """cp_time/argmax and the before/after means must equal a direct
    Python computation of S_t = Σ(x−x̄) on the quantized series,
    across several random series including near-tie shapes."""
    from etl_python_azure_spark.operators.timeseries import (
        cusum_changepoint,
    )

    rng = random.Random(7)
    base = datetime.date(2024, 3, 1)
    rows = []
    series: dict[str, list[float]] = {}
    for g in range(6):
        n = rng.randrange(3, 25)
        vals = [round(rng.uniform(-50, 50), 2) for _ in range(n)]
        series[f"g{g}"] = vals
        rows += [
            (f"g{g}", base + datetime.timedelta(days=i), v)
            for i, v in enumerate(vals)
        ]
    df = spark.createDataFrame(rows, "g string, day date, v double")
    got = {r.g: r for r in cusum_changepoint(df, "g", "day", "v").collect()}
    for g, vals in series.items():
        q = [int(v * 1e8 // 1) for v in vals]  # floor at 1e-8
        tot, n = sum(q), len(q)
        mu = tot / n
        best_t, best_abs = None, -1.0
        cq = 0
        s_at = {}
        for t, qi in enumerate(q, start=1):
            cq += qi
            s = (float(cq) - float(t) * mu) / 1e8
            s_at[t] = (s, cq)
            if abs(s) > best_abs:
                best_abs, best_t = abs(s), t
        s, cq_t = s_at[best_t]
        r = got[g]
        assert r.n_points == n
        assert r.cp_time == base + datetime.timedelta(days=best_t - 1)
        assert abs(r.cusum_at_cp - s) < 1e-9
        assert abs(r.mean_before - cq_t / (best_t * 1e8)) < 1e-12
        if best_t == n:
            assert r.mean_after is None
        else:
            assert abs(
                r.mean_after - (tot - cq_t) / ((n - best_t) * 1e8)
            ) < 1e-12


def test_cms_heavy_hitters_never_misses(spark):
    """Over random zipf-ish streams: the candidate set always
    contains EVERY φ-heavy token (CMS can only over-count), and
    is_true_hh exactly marks the truly heavy ones."""
    from etl_python_azure_spark.operators.aggregates import (
        cms_heavy_hitters,
    )

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(60)]
    stream = []
    for i, w in enumerate(vocab):
        stream += [w] * (rng.randrange(1, 8) * (60 - i) // 6 + 1)
    rng.shuffle(stream)
    phi = 0.03
    counts = Counter(stream)
    thresh = -(-phi * len(stream) // 1)  # ceil
    truly_heavy = {w for w, c in counts.items() if c >= thresh}
    df = spark.createDataFrame([(t,) for t in stream], "token string")
    out = {r.token: r for r in cms_heavy_hitters(df, phi=phi).collect()}
    assert truly_heavy <= set(out)
    for w, r in out.items():
        assert r.cms_estimate >= counts[w]
        assert r.exact_count == counts[w]
        assert r.is_true_hh == (w in truly_heavy)


def test_flesch_matches_python(spark):
    import re

    from etl_python_azure_spark.operators.text import flesch_reading_ease

    rng = random.Random(5)
    words = ["alpha", "bee", "sky", "queue", "rhythm", "idea", "ox"]
    docs = []
    for i in range(20):
        n = rng.randrange(1, 30)
        txt = " ".join(rng.choice(words) for _ in range(n))
        if rng.random() < 0.6:
            txt += rng.choice([".", "!?", "..", "? !"])
        docs.append((i, txt))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in flesch_reading_ease(df).collect()}
    for i, txt in docs:
        w = len(txt.lower().split(" "))
        sy = len(re.findall(r"[aeiou]+", txt.lower()))
        s = max(1, len(re.findall(r"[.!?]+", txt)))
        r = got[i]
        assert (r.n_words, r.n_sentences, r.n_syllables) == (w, s, sy)
        assert abs(r.flesch - (206.835 - 1.015 * (w / s) - 84.6 * (sy / w))) < 1e-9


def test_band_sweep_detection_matches_bruteforce_lsh(spark):
    """For every banding configuration, n_detected in each bin must
    equal a direct Python MinHash+banding simulation using the same
    md5 hash family and min‖max band fingerprint."""
    import hashlib

    from etl_python_azure_spark.operators.dedup import lsh_band_sweep

    rng = random.Random(31)
    base_words = [f"tok{i}" for i in range(40)]
    docs = []
    for i in range(12):
        if i % 4 == 1:
            words = docs[-1][1].split(" ")  # duplicate of previous
            words = words[: max(3, len(words) - rng.randrange(0, 3))]
            docs.append((i, " ".join(words)))
        else:
            n = rng.randrange(4, 14)
            docs.append(
                (i, " ".join(rng.choice(base_words) for _ in range(n)))
            )
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def shingles(txt):
        t = txt.lower().split(" ")
        return {
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        } if len(t) >= 3 else set()

    def sig(sh):
        return [
            min(
                hashlib.md5(f"{s}:{x}".encode()).hexdigest() for x in sh
            )
            for s in range(8)
        ]

    sh = {i: shingles(t) for i, t in docs}
    sg = {i: sig(s) for i, s in sh.items() if s}
    expected = {}
    for r in (1, 2, 4):
        nb = 8 // r
        buckets = {}
        for i, g in sg.items():
            for b in range(nb):
                slots = g[b * r : (b + 1) * r]
                fp = hashlib.md5(
                    (min(slots) + max(slots)).encode()
                ).hexdigest()
                buckets.setdefault((b, fp), set()).add(i)
        cand = set()
        for members in buckets.values():
            for a in members:
                for b2 in members:
                    if a < b2:
                        cand.add((a, b2))
        for a in sh:
            for b2 in sh:
                if a < b2 and sh[a] and sh[b2]:
                    inter = len(sh[a] & sh[b2])
                    if inter == 0:
                        continue
                    j = inter / len(sh[a] | sh[b2])
                    key = (8 // r, r, int(j * 5))
                    n_p, n_d = expected.get(key, (0, 0))
                    expected[key] = (
                        n_p + 1,
                        n_d + (1 if (a, b2) in cand else 0),
                    )
    got = {
        (r.bands, r.rows_per_band, r.j_bin5): (r.n_pairs, r.n_detected)
        for r in lsh_band_sweep(df, "doc_id", "text", j_floor=0.0).collect()
    }
    assert got == expected
