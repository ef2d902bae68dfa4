"""Round-6 surface: RM3 feedback retrieval, MinHash calibration,
trigram LM, CC cluster sizes, Heaps' law, IVF-tier MMR, and the
composed-curation equivalence properties."""

from __future__ import annotations

import hashlib
import math
import random

from pyspark.sql import functions as F

from conftest import SF_SMOKE


# ------------------------------------------------------------------ RM3
def _retrieval_corpus(spark):
    rows = [
        # feedback docs: contain the query term plus heavy "banana"
        (1, "apple banana banana banana one two three four five six"),
        (2, "apple banana banana kiwi seven eight nine ten eleven twelve"),
        # the recall target: no query term at all, rich in the
        # expansion term — invisible to pass 1
        (3, "banana banana banana salad recipe with cream and sugar mix"),
        # filler without apple or banana
        (4, "completely unrelated text about sorting networks and trees"),
        (5, "another filler document on graph theory and flows today"),
        (6, "the last filler talks about parquet files and shuffles"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_rm3_expansion_recovers_unmatched_doc(spark):
    from etl_python_azure_spark.operators.search import rm3_bm25_topk

    d = _retrieval_corpus(spark)
    out = {
        r["doc_id"]: r.asDict()
        for r in rm3_bm25_topk(
            d, ["apple"], k=6, n_fb=2, m_expansion=1
        ).collect()
    }
    # doc 3 has no "apple": pass 1 can never return it; the mined
    # expansion term ("banana", dominant in both feedback docs)
    # must pull it into the pass-2 ranking
    assert 3 in out
    assert out[3]["n_terms_hit"] == 1
    # feedback docs hit both terms
    assert out[1]["n_terms_hit"] == 2 and out[2]["n_terms_hit"] == 2
    # pure filler never enters: no apple, no banana
    assert 4 not in out and 5 not in out


def test_rm3_zero_expansion_matches_plain_bm25(spark):
    from etl_python_azure_spark.operators.search import (
        bm25_topk,
        rm3_bm25_topk,
    )

    d = _retrieval_corpus(spark)
    base = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(d, ["apple", "banana"], k=6).collect()
    }
    rm3 = {
        r["doc_id"]: r["score"]
        for r in rm3_bm25_topk(
            d, ["apple", "banana"], k=6, n_fb=2, m_expansion=0
        ).collect()
    }
    # same doc set; scores agree to the 1e-8 quantization grid (the
    # pass-2 accumulation quantizes per-term scores; plain BM25
    # pivot-sums them exactly)
    assert set(base) == set(rm3)
    for doc_id, s in base.items():
        assert abs(rm3[doc_id] - s) < 1e-6


# ------------------------------------------------- MinHash calibration
def test_minhash_calibration_identical_docs_row(spark):
    from etl_python_azure_spark.operators.dedup import minhash_calibration

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "totally different words live here about graphs and trees"),
        (4, "totally different words live here about graphs and moss"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["est_jaccard"]: r.asDict()
        for r in minhash_calibration(d, "doc_id", "text").collect()
    }
    # identical docs: every signature slot matches and exact J = 1
    assert 1.0 in out
    row = out[1.0]
    assert row["mean_exact_jaccard"] == 1.0
    assert row["mean_abs_err"] == 0.0
    # every estimate sits on the 1/8 grid and errors are bounded
    for est, r in out.items():
        assert abs(est * 8 - round(est * 8)) < 1e-12
        assert 0.0 <= r["mean_abs_err"] <= 1.0
        assert r["n_pairs"] >= 1


# ------------------------------------------------------- trigram LM
def test_trigram_scores_match_bruteforce(spark):
    from etl_python_azure_spark.operators.text import trigram_logprob_scores

    rows = [
        (1, "a b c a b c a b"),
        (2, "a b d"),
        (3, "x y"),  # fewer than 3 tokens -> no output row
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in trigram_logprob_scores(d).collect()
    }
    assert 3 not in got

    # brute-force replica of the model — the vocabulary and bigram
    # contexts train on ALL docs, including ones too short to score
    docs = {
        1: "a b c a b c a b".split(),
        2: "a b d".split(),
        3: "x y".split(),
    }
    tris: dict[tuple, int] = {}
    bigs: dict[tuple, int] = {}
    vocab = set()
    for toks in docs.values():
        vocab.update(toks)
        for i in range(len(toks) - 1):
            bigs[(toks[i], toks[i + 1])] = bigs.get(
                (toks[i], toks[i + 1]), 0
            ) + 1
        for i in range(len(toks) - 2):
            t = (toks[i], toks[i + 1], toks[i + 2])
            tris[t] = tris.get(t, 0) + 1
    V = len(vocab)

    def lp(t):
        raw = math.log((tris[t] + 1.0) / (bigs[(t[0], t[1])] + 1.0 * V))
        return math.floor(raw * 1e8) / 1e8

    for doc_id, toks in docs.items():
        if len(toks) < 3:
            continue
        doc_tris = [
            (toks[i], toks[i + 1], toks[i + 2])
            for i in range(len(toks) - 2)
        ]
        expect = sum(sorted(lp(t) for t in doc_tris)) / len(doc_tris)
        assert got[doc_id]["n_trigrams"] == len(doc_tris)
        assert abs(got[doc_id]["avg_trigram_lp"] - expect) < 1e-9


def test_trigram_ranks_prose_above_word_salad(spark):
    from etl_python_azure_spark.operators.text import trigram_logprob_scores

    base = "the quick brown fox jumps over the lazy dog again and again"
    words = base.split()
    rng = random.Random(7)
    salad = " ".join(rng.sample(words, len(words)))
    d = spark.createDataFrame(
        [(1, base), (2, base), (3, base), (4, salad)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["avg_trigram_lp"]
        for r in trigram_logprob_scores(d).collect()
    }
    # repeated prose shares trigram mass; the shuffle has almost none
    assert got[1] > got[4]


# ------------------------------------------------- CC cluster sizes
def test_cc_cluster_sizes_histogram(spark):
    from etl_python_azure_spark.operators.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
    )

    txt_a = "one two three four five six seven eight nine ten"
    txt_b = "red green blue yellow purple orange black white pink gray"
    rows = [
        (1, txt_a),
        (2, txt_a),
        (3, txt_a),
        (10, txt_b),
        (11, txt_b),
        (20, "a singleton document with entirely distinct words inside"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.8)
    labels = dedup_clusters(pairs)
    hist = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"])
        for r in labels.groupBy("cluster_rep")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("cluster_size").alias("n_docs"),
        )
        .collect()
    }
    # one 3-cluster, one 2-cluster; singletons never enter the pair
    # graph so they don't appear
    assert hist == {3: (1, 3), 2: (1, 2)}


# ------------------------------------------------------- Heaps' law
def test_heaps_beta_extremes(spark):
    from etl_python_azure_spark.operators.text import heaps_law_fit

    # every doc introduces only new tokens -> V(n) = c.n -> beta ~ 1
    growing = spark.createDataFrame(
        [
            (i, " ".join(f"tok{i}x{j}" for j in range(8)))
            for i in range(50)
        ],
        "doc_id long, text string",
    )
    r = heaps_law_fit(growing, n_prefixes=5).first()
    assert r["n_points"] == 5
    assert r["total_vocab"] == 50 * 8
    assert abs(r["heaps_beta"] - 1.0) < 1e-6

    # constant vocabulary -> V(n) flat -> beta ~ 0
    flat = spark.createDataFrame(
        [(i, "same five words every single time") for i in range(50)],
        "doc_id long, text string",
    )
    r2 = heaps_law_fit(flat, n_prefixes=5).first()
    assert r2["total_vocab"] == 6
    assert abs(r2["heaps_beta"]) < 1e-6


# ------------------------------------------------------- IVF-tier MMR
def test_mmr_ivf_contract(spark):
    from etl_python_azure_spark.operators.similarity import (
        ivf_topk,
        mmr_topk,
    )

    rng = random.Random(11)
    em = spark.createDataFrame(
        [
            (i, [float(rng.uniform(-1, 1)) for _ in range(16)])
            for i in range(40)
        ],
        "vec_id long, embedding array<float>",
    )
    cand = ivf_topk(
        em, em.filter("vec_id = 0"), k=8, num_centroids=8, nprobe=3
    ).select(
        F.col("neighbor_id").alias("cid"), F.col("cosine").alias("rel")
    )
    cand_ids = {r["cid"] for r in cand.collect()}
    out = mmr_topk(em, query_id=0, k=4, candidates=cand).collect()
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [
        1,
        2,
        3,
        4,
    ]
    ids = [r["vec_id"] for r in out]
    assert len(set(ids)) == 4
    assert set(ids) <= cand_ids
    first = next(r for r in out if r["rank"] == 1)
    # rank 1 is the most relevant candidate, scored by raw relevance
    assert first["mmr_score"] == first["relevance"]
    assert first["relevance"] == max(r["relevance"] for r in out)


# -------------------------------------------- composed curation
def test_curation_counts_report_invariants(spark):
    from etl_python_azure_spark.queries.round6 import (
        curation_counts_report,
    )

    r = curation_counts_report(spark, SF_SMOKE).first().asDict()
    assert r["n_input"] >= r["n_quality"] >= r["n_exact"] >= r["n_near"]
    assert r["n_near"] == r["n_train"] + r["n_val"] + r["n_test"]
    # exact dedup ran first, so no fingerprint can cross splits
    assert r["n_leaked_fps"] == 0
    assert r["n_train_capped"] <= r["n_train"]


def _train_bucket(doc_id: int) -> bool:
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    return h % 100 < 90


def _synth_corpus(seed: int):
    """Random docs that pass the Gopher gate: ≥10 words, sane mean
    word length, stopword mass, distinct ratio."""
    rng = random.Random(seed)
    vocab = [f"word{c}" for c in "abcdefghijklmnopqrst"]
    stop = ["the", "a", "of", "and"]

    def doc():
        toks = rng.choices(stop, k=3) + rng.choices(vocab, k=11)
        rng.shuffle(toks)
        return " ".join(toks)

    return rng, doc


def test_incremental_curation_equivalent_to_batch(spark, tmp_path):
    """r05 verdict item 7: curate_increment(base, delta) must equal
    curate_corpus(base ∪ delta) on the admitted-row set, in the
    regime where the two pipelines' policies provably coincide
    (delta ids above base ids — the nightly append shape — every id
    hashing to the train split, and a non-binding quota; the
    docstring states the quota tie-policy divergence outside it)."""
    from etl_python_azure_spark.plans.curation import (
        curate_corpus,
        curate_increment,
    )

    for seed in (1, 2):
        rng, doc = _synth_corpus(seed)
        # ids constrained to the train bucket so the batch split
        # stage keeps every survivor in scope
        train_ids = [i for i in range(400) if _train_bucket(i)]
        base_ids = train_ids[:14]
        delta_ids = train_ids[14:26]
        assert max(base_ids) < min(delta_ids)

        base_rows = [
            (i, f"s{i % 3}", doc()) for i in base_ids
        ]
        by_id = dict((i, t) for i, _, t in base_rows)
        delta_rows = []
        for j, i in enumerate(delta_ids):
            if j == 0:
                # exact copy of a base doc
                text = by_id[base_ids[0]]
            elif j == 1:
                # near copy of a base doc (one word swapped)
                toks = by_id[base_ids[1]].split()
                toks[-1] = "swapped"
                text = " ".join(toks)
            elif j == 2:
                # within-delta exact dup of the doc added at j == 3
                text = None  # placeholder, filled below
            else:
                text = doc()
            delta_rows.append([i, f"s{i % 3}", text])
        delta_rows[2][2] = delta_rows[3][2]
        delta_rows = [tuple(r) for r in delta_rows]

        schema = "doc_id long, source string, text string"
        base_df = spark.createDataFrame(base_rows, schema)
        union_df = spark.createDataFrame(
            base_rows + list(delta_rows), schema
        )

        base_src = str(tmp_path / f"base_src_{seed}")
        union_src = str(tmp_path / f"union_src_{seed}")
        base_df.write.mode("overwrite").parquet(
            f"{base_src}/documents.parquet"
        )
        union_df.write.mode("overwrite").parquet(
            f"{union_src}/documents.parquet"
        )

        base_sink = str(tmp_path / f"base_sink_{seed}")
        union_sink = str(tmp_path / f"union_sink_{seed}")
        curate_corpus(
            spark, base_src, base_sink, quota_per_source=1000,
            near_dup_threshold=0.5,
        )
        curate_corpus(
            spark, union_src, union_sink, quota_per_source=1000,
            near_dup_threshold=0.5,
        )
        batch_train = {
            r["doc_id"]
            for r in spark.read.parquet(f"{union_sink}/train").collect()
        }
        base_train = {
            r["doc_id"]
            for r in spark.read.parquet(f"{base_sink}/train").collect()
        }
        admitted = {
            r["doc_id"]
            for r in curate_increment(
                spark,
                f"{base_sink}/train",
                spark.createDataFrame(delta_rows, schema),
                quota_per_source=1000,
                near_dup_threshold=0.5,
            ).collect()
        }
        spark.catalog.clearCache()
        assert base_train | admitted == batch_train, (
            seed,
            sorted(base_train),
            sorted(admitted),
            sorted(batch_train),
        )
        # the injected dups were actually exercised
        assert delta_ids[0] not in admitted
        assert delta_ids[1] not in admitted
        assert delta_ids[2] in admitted or delta_ids[3] in admitted
        assert not (
            delta_ids[2] in admitted and delta_ids[3] in admitted
        )
