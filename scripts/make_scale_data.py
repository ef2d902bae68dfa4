#!/usr/bin/env python
"""Synthesize a larger SF from sf0.1 for SCALE REHEARSAL ONLY.

/root/testdata tops out at sf0.1; the r03 verdict (item 5) asks for
an sf1 rehearsal of the expensive queries to verify the near-linear
scaling SCALING.md claims. This replicates sf0.1 N× with consistent
key remapping, preserving the statistical shape a real 10× corpus
would have:

- fact/dim keys are offset per replica (``key + r * (max_key + 1)``)
  with foreign keys remapped consistently, so join fan-outs,
  group-by cardinalities per key, and skew profiles are UNCHANGED —
  the corpus just has 10× the keys;
- ``documents.text`` is token-salted per replica (every whitespace
  token gets a replica suffix for r > 0), so cross-replica documents
  share no shingles and the true-duplicate RATE stays constant —
  naive replication would give every doc 10 exact copies and inflate
  dedup pair output quadratically, which is not what a 10× corpus
  looks like; ``n_chars`` is recomputed;
- ``region``/``nation`` stay fixed (dimensions);
- ``embeddings`` ids are offset, vectors copied (bucket sizes scale
  linearly; queries stay the original vec_id < 10 set).

Deterministic, pure DataFrame ops, no RNG. Output goes under the
repo scratch dir (never /root/testdata, which is read-only).

Usage: python scripts/make_scale_data.py [--replicas 10]
       [--src /root/testdata/sf0.1] [--out /root/repo/.scratch/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

COPY_TABLES = ("region", "nation")
# table -> {column: key domain}; every column sharing a domain gets
# the same offset so referential integrity survives replication
KEYED_TABLES: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}


def _domain_offsets(spark: SparkSession, src: str) -> dict[str, int]:
    """max_key + 1 per key domain (one tiny agg per source table)."""
    out: dict[str, int] = {}
    for table, cols in KEYED_TABLES.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        for col, dom in cols.items():
            hi = df.agg(F.max(F.col(col)).alias("m")).first()["m"]
            out[dom] = max(out.get(dom, 0), int(hi) + 1)
    return out


def _replicate(
    df: DataFrame, keys: dict[str, str], offsets: dict[str, int], replicas: int
) -> DataFrame:
    """Union of *replicas* key-shifted copies, built as ONE lazy plan
    (explode over the replica index — no driver loop unions)."""
    rep = df.withColumn(
        "__r", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1)))
    )
    for col, dom in keys.items():
        rep = rep.withColumn(
            col, F.col(col) + F.col("__r") * F.lit(offsets[dom])
        )
    return rep


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scratch",
            "sf1",
        ),
    )
    args = ap.parse_args()

    from etl_python_azure_spark.session import get_spark, load_tables

    spark = get_spark("make-scale-data")
    os.makedirs(args.out, exist_ok=True)
    offsets = _domain_offsets(spark, args.src)
    print(f"key-domain offsets: {offsets}")

    for t in COPY_TABLES:
        spark.read.parquet(f"{args.src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{args.out}/{t}.parquet")

    for t, keys in KEYED_TABLES.items():
        # events needs the ns-timestamp-safe loader; plain read is
        # fine elsewhere and preserves physical types
        df = (
            load_tables(spark, args.src, t)
            if t == "events"
            else spark.read.parquet(f"{args.src}/{t}.parquet")
        )
        rep = _replicate(df, keys, offsets, args.replicas)
        if t == "documents":
            # salt every non-empty token for r > 0 with a separator
            # (\x01) no original token contains: replicas share no
            # shingles AND a salted token can never collide with a
            # pre-existing one (plain concat would map 'foo'→'foo1',
            # which may already exist in replica 0); empty tokens
            # from double spaces stay empty so token counts match
            # replica 0 exactly
            salted = F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.when(w == "", w).otherwise(
                        F.concat(
                            w, F.lit("\x01"), F.col("__r").cast("string")
                        )
                    ),
                ),
                " ",
            )
            rep = rep.withColumn(
                "text",
                F.when(F.col("__r") == 0, F.col("text")).otherwise(salted),
            ).withColumn("n_chars", F.length("text").cast("int"))
        rep.drop("__r").write.mode("overwrite").parquet(
            f"{args.out}/{t}.parquet"
        )
        print(f"wrote {t} x{args.replicas}")
    print(f"done: {args.out}")


if __name__ == "__main__":
    main()
