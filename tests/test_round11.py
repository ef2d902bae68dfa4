"""Round-11 surface: token-level span operators, the quality-keeper
missing-quality fallback, the distributed epoch shuffle, the span
tier in the streaming admit fold, and the NB quality classifier."""

from __future__ import annotations

import hashlib
import math
import os

from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# quality_keeper_drops: missing-quality fallback (r10 ADVICE).
# --------------------------------------------------------------------------


def test_quality_keeper_drops_fallback_hand_case(spark):
    """One pair per fallback branch: (1,2) a-side unscored → drop 1;
    (3,4) b-side unscored → drop 4; (5,6) both unscored → keep-first
    fallback drops 6; (7,8) both scored → normal compare drops 7."""
    from etl_python_azure_spark.operators.dedup import (
        quality_keeper_drops,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (7, 8)], "id_a long, id_b long"
    )
    quality = spark.createDataFrame(
        [(2, 5.0), (3, 5.0), (7, 1.0), (8, 2.0)],
        "doc_id long, quality double",
    )
    out = {
        r["doc_id"]
        for r in quality_keeper_drops(pairs, quality).collect()
    }
    assert out == {1, 4, 6, 7}


# --------------------------------------------------------------------------
# epoch_shuffle: distributed rank.
# --------------------------------------------------------------------------


def test_epoch_shuffle_matches_global_md5_rank(spark):
    """Positions equal the brute-force global md5 rank per epoch and
    are invariant to the bucket-width knob (bucket order IS key
    order)."""
    from etl_python_azure_spark.operators.sampling import epoch_shuffle

    ids = list(range(37))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")

    def brute(epoch):
        keys = sorted(
            (hashlib.md5(f"{epoch}:{i}".encode()).hexdigest(), i)
            for i in ids
        )
        return {i: rank + 1 for rank, (_, i) in enumerate(keys)}

    expected = {(e, i): p for e in range(2) for i, p in brute(e).items()}
    for d in (1, 3):
        got = {
            (r["epoch"], r["doc_id"]): r["pos"]
            for r in epoch_shuffle(
                df, "doc_id", epochs=2, bucket_hex_digits=d
            ).collect()
        }
        assert got == expected, f"bucket_hex_digits={d}"


def test_epoch_shuffle_plan_has_no_whole_epoch_window(spark, sf_dir):
    """The corpus-sized row_number window partitions by
    (epoch, bucket) — never by epoch alone (the r10-ADVICE
    single-task-per-epoch shape) — and the bucket offsets come back
    via a broadcast join."""
    from etl_python_azure_spark.queries import registry

    df = registry()["epoch_shuffle_manifest"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    specs = [
        seg.split(")")[0]
        for seg in plan.split("windowspecdefinition(")[1:]
    ]
    big = [s for s in specs if "__key" in s]
    assert big, "expected the rank window over the md5 key"
    assert all("__bkt" in s for s in big)


def test_epoch_shuffle_rejects_bad_bucket_width(spark):
    import pytest

    from etl_python_azure_spark.operators.sampling import epoch_shuffle

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        epoch_shuffle(df, "doc_id", bucket_hex_digits=0)
    with pytest.raises(ValueError):
        epoch_shuffle(df, "doc_id", bucket_hex_digits=9)


# --------------------------------------------------------------------------
# language_id_ngram: no corpus-sized persist may outlive the call.
# --------------------------------------------------------------------------


def test_language_id_ngram_leaves_no_cached_rdds(spark):
    from etl_python_azure_spark.operators.text import language_id_ngram

    spark.catalog.clearCache()
    # delta-based: earlier suite tests may leave localCheckpoint
    # blocks that clearCache does not (and should not) drop — the
    # assertion is that THIS operator adds none
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    df = spark.createDataFrame(
        [
            (1, "en", "the cat and the dog and the bird sing"),
            (2, "de", "der hund und die katze und der vogel"),
            (3, "en", "the bird and the cat see the dog again"),
        ],
        "doc_id long, lang string, text string",
    )
    out = language_id_ngram(df, "doc_id", "text", "lang", n=3)
    assert out.count() == 3
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert after == before


def test_perplexity_buckets_rejects_single_bucket(spark):
    import pytest

    from etl_python_azure_spark.operators.text import perplexity_buckets

    df = spark.createDataFrame(
        [(1, "en", "a b c")], "doc_id long, lang string, text string"
    )
    with pytest.raises(ValueError):
        perplexity_buckets(df, n_buckets=1)


# --------------------------------------------------------------------------
# Token-level span operators: brute force on a hand fixture.
# --------------------------------------------------------------------------


def _bpe_ish(text: str) -> list[str]:
    import re

    return re.findall(r"[a-z]+|[0-9]+|[^a-z0-9 ]", text.lower())


def _merged_cover(flag_positions: list[int], w: int) -> int:
    """Union length of [p, p+w) intervals (1-based starts)."""
    covered = set()
    for p in flag_positions:
        covered.update(range(p, p + w))
    return len(covered)


def test_token_span_contamination_brute_force(spark):
    """Token-alphabet contamination vs a Python brute force: doc 10
    embeds a verbatim slice of reference doc 0 with DIFFERENT
    punctuation/casing glued on — invisible to the whitespace-token
    variant at the same window, visible to the BPE-ish one."""
    from etl_python_azure_spark.operators.dedup import span_contamination
    from etl_python_azure_spark.operators.text import bpe_ish_tokens

    w = 4
    ref_text = "alpha beta gamma delta epsilon zeta eta theta"
    # same token stream as a ref slice once punctuation splits:
    # "Alpha, beta gamma delta." → [alpha , beta gamma delta .]
    corpus = [
        (0, ref_text),
        (10, "Alpha beta gamma delta epsilon intro words here"),
        (11, "totally unrelated words live in this document"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    ref = df.filter(F.col("doc_id") == 0)
    got = {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"])
        for r in span_contamination(
            df, ref, "doc_id", "text", window=w, tokenizer=bpe_ish_tokens
        ).collect()
    }

    ref_toks = _bpe_ish(ref_text)
    ref_spans = {
        tuple(ref_toks[i : i + w]) for i in range(len(ref_toks) - w + 1)
    }
    for doc_id, text in corpus:
        toks = _bpe_ish(text)
        if doc_id == 0:  # same-id matches excluded
            expect = (len(toks), 0)
        else:
            flags = [
                i + 1
                for i in range(max(len(toks) - w + 1, 0))
                if tuple(toks[i : i + w]) in ref_spans
            ]
            expect = (len(toks), _merged_cover(flags, w))
        assert got[doc_id] == expect, doc_id
    assert got[10][1] > 0  # the embedded slice is detected


def test_merged_span_coverage_token_alphabet(spark):
    """Cross-doc duplicated coverage in the token alphabet counts
    punctuation-token positions correctly (brute-force check)."""
    from etl_python_azure_spark.operators.dedup import merged_span_coverage
    from etl_python_azure_spark.operators.text import bpe_ish_tokens

    w = 3
    texts = {
        1: "one two three four five six",
        2: "zero one two three four nine!",
        3: "nothing shared here at all now",
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"])
        for r in merged_span_coverage(
            df, "doc_id", "text", window=w, tokenizer=bpe_ish_tokens
        ).collect()
    }
    span_docs: dict[tuple, set] = {}
    toks = {k: _bpe_ish(t) for k, t in texts.items()}
    for k, tt in toks.items():
        for i in range(len(tt) - w + 1):
            span_docs.setdefault(tuple(tt[i : i + w]), set()).add(k)
    for k, tt in toks.items():
        flags = [
            i + 1
            for i in range(len(tt) - w + 1)
            if len(span_docs[tuple(tt[i : i + w])]) >= 2
        ]
        assert got[k] == (len(tt), _merged_cover(flags, w)), k
    assert got[1][1] > 0 and got[3][1] == 0


# --------------------------------------------------------------------------
# NB quality classifier vs a Python brute force.
# --------------------------------------------------------------------------


def test_nb_quality_classifier_brute_force(spark, tmp_path):
    from etl_python_azure_spark.queries import registry

    rows = [
        (0, "the good curated text reads well", "en", "src0", 1),
        (1, "more curated prose with the good words", "en", "src1", 1),
        (2, "spam spam spam click here now", "en", "src5", 2),
        (3, "the good words appear here too", "en", "src7", 3),
        (4, "click spam now now now", "en", "src9", 4),
    ]
    df = spark.createDataFrame(
        [(i, t, lg, s, n) for i, t, lg, s, n in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    src = tmp_path / "mini"
    src.mkdir()
    df.coalesce(1).write.parquet(str(src / "documents.parquet"))

    out = {
        r["doc_id"]: (r["score_pos"], r["score_neg"], r["pred_pos"])
        for r in registry()["nb_quality_classifier"]
        .builder(spark, str(src))
        .collect()
    }

    # Python brute force (multinomial NB, Laplace, floor(ln*1e8))
    docs = {i: t.lower().split(" ") for i, t, *_ in rows}
    pos = {0, 1}
    cp: dict[str, int] = {}
    cn: dict[str, int] = {}
    for i, toks in docs.items():
        tgt = cp if i in pos else cn
        for t in toks:
            tgt[t] = tgt.get(t, 0) + 1
    vocab = set(cp) | set(cn)
    np_, nn_, v = sum(cp.values()), sum(cn.values()), len(vocab)

    def q(x: float) -> int:
        return int(math.floor(math.log(x) * 1e8))

    pp = q(len(pos) / len(docs))
    pn = q((len(docs) - len(pos)) / len(docs))
    for i, toks in docs.items():
        sp = pp + sum(q((cp.get(t, 0) + 1) / (np_ + v)) for t in toks)
        sn = pn + sum(q((cn.get(t, 0) + 1) / (nn_ + v)) for t in toks)
        assert out[i] == (sp, sn, int(sp > sn)), i
    # resubstitution separates the hand-built classes
    assert out[0][2] == 1 and out[2][2] == 0


# --------------------------------------------------------------------------
# Streaming ingest with the span tier.
# --------------------------------------------------------------------------


def _mkdocs(spark, rows):
    from etl_python_azure_spark.streaming.corpus_ingest import DOC_SCHEMA

    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_streaming_ingest_span_tier_rejects_covered_doc(spark, tmp_path):
    """A delta doc sharing a 20-token prefix with a base doc (13 of
    its 16 8-token spans covered, Jaccard 0.75 < 0.8 so the fuzzy
    tier misses it) is rejected IFF the span tier is enabled — the
    streaming counterpart of the batch v3 span stage."""
    from etl_python_azure_spark.streaming.corpus_ingest import (
        streaming_curated_ingest,
    )

    base_words = [f"w{i}" for i in range(20)]
    novel = [f"x{i}" for i in range(10)]
    doc_base = "the a of " + " ".join(base_words)
    doc_covered = "the a of " + " ".join(base_words[:17] + novel[:3])
    doc_fresh = "the a of " + " ".join(base_words[:10] + novel)

    for enabled in (True, False):
        tag = "on" if enabled else "off"
        base_dir = str(tmp_path / f"base_{tag}")
        drop_dir = str(tmp_path / f"drop_{tag}")
        os.makedirs(drop_dir)
        _mkdocs(spark, [(0, "s1", doc_base)]).write.parquet(base_dir)
        _mkdocs(
            spark, [(10, "s1", doc_covered), (11, "s1", doc_fresh)]
        ).write.parquet(os.path.join(drop_dir, "b1"))

        q = streaming_curated_ingest(
            spark,
            drop_dir,
            base_dir,
            str(tmp_path / f"ckpt_{tag}"),
            quota_per_source=10,
            near_dup_threshold=0.8,
            span_window=8 if enabled else None,
        )
        assert q.awaitTermination(600), "ingest query did not drain in 600s"
        got = {
            r["doc_id"] for r in spark.read.parquet(base_dir).collect()
        }
        assert got == ({0, 11} if enabled else {0, 10, 11}), tag


def test_curate_increment_span_tier_within_delta(spark, tmp_path):
    """Within one delta, a higher-id doc whose spans are ≥half
    covered by a LOWER-id delta doc is rejected even with an
    unrelated base."""
    from etl_python_azure_spark.plans.curation import curate_increment

    base_dir = str(tmp_path / "base")
    _mkdocs(
        spark,
        [(0, "s1", "the a of " + " ".join(f"z{i}" for i in range(20)))],
    ).write.parquet(base_dir)

    words = [f"w{i}" for i in range(20)]
    lead = "the a of " + " ".join(words)
    covered = "the a of " + " ".join(words[:17] + ["q0", "q1", "q2"])
    delta = _mkdocs(spark, [(5, "s1", lead), (6, "s1", covered)])
    admitted = {
        r["doc_id"]
        for r in curate_increment(
            spark,
            base_dir,
            delta,
            quota_per_source=10,
            near_dup_threshold=0.8,
            span_window=8,
        ).collect()
    }
    spark.catalog.clearCache()
    assert admitted == {5}


# --------------------------------------------------------------------------
# v3 lite counts + drop attribution reconcile with the full report.
# --------------------------------------------------------------------------


def test_v3_lite_and_attribution_reconcile(spark, sf_dir):
    from etl_python_azure_spark.queries import registry

    reg = registry()
    lite = (
        reg["curation_v3_counts_lite"].builder(spark, sf_dir).collect()
    )[0].asDict()
    att = {
        (r["source"], r["stage"]): r["n_docs"]
        for r in reg["curation_drop_attribution"]
        .builder(spark, sf_dir)
        .collect()
    }

    def stage_total(stage):
        return sum(n for (s, st), n in att.items() if st == stage)

    assert sum(att.values()) == lite["n_input"]
    assert stage_total("url") == lite["n_input"] - lite["n_url"]
    assert stage_total("quality") == lite["n_url"] - lite["n_quality"]
    assert stage_total("exact") == lite["n_quality"] - lite["n_exact"]
    assert stage_total("near") == lite["n_exact"] - lite["n_near"]
    assert stage_total("span") == lite["n_near"] - lite["n_span"]
    assert stage_total("dsir") == lite["n_span"] - lite["n_dsir"]
    assert stage_total("kept_val") == lite["n_val"]
    assert stage_total("kept_test") == lite["n_test"]
    assert stage_total("kept_train") == lite["n_train_capped"]
    assert (
        stage_total("quota")
        == lite["n_train"] - lite["n_train_capped"]
    )


# --------------------------------------------------------------------------
# Batch-2 round-11 queries: hand-case guards.
# --------------------------------------------------------------------------


def test_epoch_shuffle_shard_manifest_tiles(spark, sf_dir):
    """Shards tile the per-epoch position space exactly: bounds are
    contiguous, row counts sum to n per epoch — only true if the
    distributed rank is a gap-free bijection 1..n."""
    from etl_python_azure_spark.queries import registry

    rows = (
        registry()["epoch_shuffle_shard_manifest"]
        .builder(spark, sf_dir)
        .collect()
    )
    by_epoch: dict[int, list] = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], []).append(r)
    assert set(by_epoch) == {0, 1}
    for _epoch, shards in by_epoch.items():
        shards.sort(key=lambda r: r["shard"])
        n = sum(r["n_rows"] for r in shards)
        assert shards[0]["min_pos"] == 1
        assert shards[-1]["max_pos"] == n
        for a, b in zip(shards, shards[1:]):
            assert b["min_pos"] == a["max_pos"] + 1
        for r in shards:
            assert r["n_rows"] == r["max_pos"] - r["min_pos"] + 1


def test_span_threshold_sweep_monotone(spark, sf_dir):
    """A stricter (higher) threshold can only drop fewer docs and
    less token mass."""
    from etl_python_azure_spark.queries import registry

    rows = sorted(
        registry()["span_threshold_sweep"]
        .builder(spark, sf_dir)
        .collect(),
        key=lambda r: r["threshold_pct"],
    )
    assert [r["threshold_pct"] for r in rows] == [10, 50, 90]
    for a, b in zip(rows, rows[1:]):
        assert b["n_dropped"] <= a["n_dropped"]
        assert b["dropped_tokens"] <= a["dropped_tokens"]


def test_keeper_policy_delta_hand_case(spark, tmp_path):
    """Two near-dup pairs: one where the LATER doc is longer (the
    policies disagree; gain = the extra words) and one where the
    earlier doc is at least as long (agree, no gain)."""
    from etl_python_azure_spark.queries import registry

    base = " ".join(f"w{i}" for i in range(40))
    rows = [
        (0, base, "en", "s", 1),
        (1, base + " extra tokens", "en", "s", 1),  # later & longer
        (10, base.replace("w", "v") + " tail word", "en", "s", 1),
        (11, base.replace("w", "v"), "en", "s", 1),  # later & shorter
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    src = tmp_path / "mini"
    src.mkdir()
    df.coalesce(1).write.parquet(str(src / "documents.parquet"))
    out = (
        registry()["keeper_policy_delta"]
        .builder(spark, str(src))
        .collect()[0]
    )
    assert out["n_pairs"] == 2
    assert out["n_disagree"] == 1
    assert out["words_gain"] == 2
